"""Text frontend: the 178-symbol phoneme table and cleaner.

Matches the reference symbol inventory (reference meldataset.py:23-45,
text_utils.py:1-27): index 0 is the pad symbol '$', then punctuation,
Latin letters, and IPA symbols. Token ids feed both the TextEncoder
embedding and PL-BERT.

Phonemization itself (espeak-ng via `phonemizer`) is an optional external
step, exactly as in the reference where training lists are pre-phonemized;
`phonemize()` gates on the package being importable.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

_PAD = "$"
_PUNCTUATION = ';:,.!?¡¿—…"«»“” '
_LETTERS = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
_LETTERS_IPA = (
    "ɑɐɒæɓʙβɔɕçɗɖðʤəɘɚɛɜɝɞɟʄɡɠɢʛɦɧħɥʜɨɪʝɭɬɫɮʟɱɯɰŋɳɲɴøɵɸθœɶʘɹɺɾɻʀʁɽʂʃʈʧʉʊʋⱱʌɣɤʍχʎʏʑʐʒʔʡʕʢǀǁǂǃˈˌːˑʼʴʰʱʲʷˠˤ˞↓↑→↗↘'̩'ᵻ"
)

SYMBOLS: List[str] = [_PAD] + list(_PUNCTUATION) + list(_LETTERS) + list(_LETTERS_IPA)
SYMBOL_TO_ID: Dict[str, int] = {s: i for i, s in enumerate(SYMBOLS)}
N_SYMBOLS = len(SYMBOLS)  # 178 token table (n_token in model config)
PAD_ID = 0


class TextCleaner:
    """Character → token-id mapping over the 178-symbol table.

    Unknown characters are skipped (the reference prints and drops them,
    meldataset.py:40-44).
    """

    def __init__(self, dummy=None):
        self.word_index_dictionary = SYMBOL_TO_ID

    def __call__(self, text: str) -> List[int]:
        indexes = []
        for char in text:
            idx = self.word_index_dictionary.get(char)
            if idx is None:
                continue
            indexes.append(idx)
        return indexes


def encode_text(text: str, pad_start: bool = True, pad_end: bool = False) -> np.ndarray:
    """Tokenize phonemized text; prepends (and optionally appends) pad id 0,
    matching the reference inference path (Demo/Inference_LJSpeech.ipynb cell 17
    inserts a leading 0; the dataset inserts 0 at both ends, meldataset.py:150-152).
    """
    ids = TextCleaner()(text)
    if pad_start:
        ids = [PAD_ID] + ids
    if pad_end:
        ids = ids + [PAD_ID]
    return np.asarray(ids, dtype=np.int32)


def word_tokenize(text: str) -> List[str]:
    """nltk.word_tokenize as used by the reference inference cells
    (Demo/Inference_LJSpeech.ipynb cell 17). Falls back to nltk's
    TreebankWordTokenizer (pure regex, no punkt data download) when the
    punkt model is unavailable — identical output for single sentences."""
    try:
        from nltk.tokenize import word_tokenize as _wt  # type: ignore

        try:
            return _wt(text)
        except LookupError:
            pass
    except Exception:
        pass
    try:
        from nltk.tokenize import TreebankWordTokenizer  # type: ignore

        return TreebankWordTokenizer().tokenize(text)
    except Exception:
        # last-resort split: punctuation as separate tokens
        import re

        return re.findall(r"[^\s;:,.!?¡¿—…\"«»“”]+|[;:,.!?¡¿—…\"«»“”]", text)


def phonemize(text: str, language: str = "en-us") -> str:
    """Raw text → IPA phoneme string, reproducing the reference inference
    preprocessing exactly (Demo/Inference_LJSpeech.ipynb cell 17):
    strip → drop double quotes → espeak phonemize of the whole text →
    word_tokenize → space-join. Requires the optional `phonemizer` package
    (espeak-ng backend); training lists are pre-phonemized as in the
    reference, so this is inference-only glue."""
    try:
        from phonemizer.backend import EspeakBackend  # type: ignore
    except Exception as e:  # pragma: no cover - optional dep
        raise ImportError(
            "phonemizer/espeak-ng not installed; pass pre-phonemized IPA text instead"
        ) from e
    backend = EspeakBackend(
        language=language, preserve_punctuation=True, with_stress=True
    )
    text = text.strip().replace('"', "")
    ps = backend.phonemize([text])
    return " ".join(word_tokenize(ps[0]))


def pad_token_batch(
    token_lists: Sequence[np.ndarray], max_len: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Zero-pad a list of token id arrays to (B, T_max); returns (tokens, lengths)."""
    lengths = np.asarray([len(t) for t in token_lists], dtype=np.int32)
    T = int(max_len if max_len is not None else lengths.max())
    out = np.zeros((len(token_lists), T), dtype=np.int32)
    for i, t in enumerate(token_lists):
        out[i, : len(t)] = t[:T]
    return out, lengths
