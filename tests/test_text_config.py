"""Text frontend + config loader tests (reference meldataset.py:23-45,
Configs/config.yml)."""

import numpy as np

from styletts2_tpu import text as T
from styletts2_tpu.config import Config, load_config


def test_symbol_table_size_and_pad():
    assert T.N_SYMBOLS == 178
    assert T.SYMBOLS[0] == "$"
    assert T.SYMBOL_TO_ID["$"] == 0
    assert T.SYMBOL_TO_ID[" "] == 16
    assert T.SYMBOL_TO_ID["A"] == 17
    assert T.SYMBOL_TO_ID["a"] == 43


def test_cleaner_skips_unknown():
    ids = T.TextCleaner()("a€b")  # € not in table
    assert ids == [T.SYMBOL_TO_ID["a"], T.SYMBOL_TO_ID["b"]]


def test_encode_and_pad_batch():
    a = T.encode_text("ab")
    assert a.tolist()[0] == 0 and len(a) == 3
    toks, lens = T.pad_token_batch([a, T.encode_text("a")])
    assert toks.shape == (2, 3)
    assert lens.tolist() == [3, 2]
    assert toks[1, 2] == 0


def test_reference_config_loads():
    cfg = load_config("/root/reference/Configs/config.yml")
    assert cfg.model_params.hidden_dim == 512
    assert cfg.model_params.style_dim == 128
    assert cfg.model_params.decoder.type == "istftnet"
    assert cfg.model_params.decoder.gen_istft_n_fft == 20
    assert cfg.model_params.diffusion.dist.mean == -3.0
    assert cfg.model_params.slm.nlayers == 13
    assert cfg.loss_params.lambda_ce == 20.0
    assert cfg.slmadv_params.sig == 1.5
    assert cfg.preprocess_params.spect_params.hop_length == 300
    assert cfg.max_len == 400


def test_reference_libritts_config_loads():
    cfg = load_config("/root/reference/Configs/config_libritts.yml")
    assert cfg.model_params.multispeaker is True
    assert cfg.max_len == 300
    assert cfg.model_params.decoder.type == "hifigan"


def test_default_config_roundtrip():
    cfg = Config()
    d = cfg.to_dict()
    cfg2 = Config.from_dict(d)
    assert cfg2.model_params.decoder.upsample_rates == [10, 6]


def test_word_tokenize_reference_preprocessing():
    """phonemize()'s tokenize step: punctuation split off as separate
    tokens, exactly like nltk word_tokenize in the reference notebook."""
    from styletts2_tpu.text import word_tokenize

    assert word_tokenize("hˈɛloʊ, wˈɜːld.") == [
        "hˈɛloʊ", ",", "wˈɜːld", "."
    ]


def test_phonemize_preprocessing_with_mock_backend(monkeypatch):
    """The raw-text frontend must reproduce the reference notebook chain
    (Demo/Inference_LJSpeech.ipynb cell 17): strip -> drop double quotes ->
    espeak phonemize -> word_tokenize -> space-join. espeak isn't in this
    image, so the backend is mocked; the real-backend path differs only in
    the IPA lookup."""
    import sys
    import types

    seen = {}

    class FakeBackend:
        def __init__(self, language, preserve_punctuation, with_stress):
            assert preserve_punctuation and with_stress
            seen["language"] = language

        def phonemize(self, texts):
            seen["input"] = texts
            return ["ðɪs ɪz ɐ tˈɛst, jˈɛs."]

    mod = types.ModuleType("phonemizer")
    backend_mod = types.ModuleType("phonemizer.backend")
    backend_mod.EspeakBackend = FakeBackend
    mod.backend = backend_mod
    monkeypatch.setitem(sys.modules, "phonemizer", mod)
    monkeypatch.setitem(sys.modules, "phonemizer.backend", backend_mod)

    out = T.phonemize('  This is a "test", yes.  ')
    assert seen["language"] == "en-us"
    assert seen["input"] == ["This is a test, yes."]  # stripped, quotes gone
    assert out == "ðɪs ɪz ɐ tˈɛst , jˈɛs ."  # word_tokenize + space-join


def test_phonemize_missing_dependency_message(monkeypatch):
    import builtins
    import sys

    monkeypatch.setitem(sys.modules, "phonemizer", None)
    monkeypatch.setitem(sys.modules, "phonemizer.backend", None)
    import pytest

    with pytest.raises(ImportError, match="pre-phonemized"):
        T.phonemize("hello")
