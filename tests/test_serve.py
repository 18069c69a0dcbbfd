"""Serving-layer tests: micro-batcher semantics (fast, fake synthesizer)
and a real end-to-end HTTP round trip on the tiny config (@slow)."""

import io
import json
import threading
import urllib.request
import wave

import numpy as np
import pytest

from styletts2_tpu.serve import Batcher, TTSServer, _Request, wav_bytes


def _params(**kw):
    return (
        float(kw.get("alpha", 0.3)),
        float(kw.get("beta", 0.7)),
        int(kw.get("steps", 5)),
        float(kw.get("scale", 1.0)),
        float(kw.get("speed", 1.0)),
        int(kw.get("seed", 0)),
    )


class FakeSynthesizer:
    """Records calls; returns per-text deterministic waveforms."""

    style_dim = 128
    multispeaker = False

    def __init__(self):
        self.calls = []

    def _wav(self, text):
        return np.full(1200 + 10 * len(text), 0.25, np.float32)

    def inference(self, text, ref_s=None, **kw):
        self.calls.append(("single", [text]))
        return self._wav(text), np.zeros((1, 256), np.float32)

    def inference_batch(self, texts, ref_s=None, **kw):
        assert ref_s is None or ref_s.shape == (len(texts), 256)
        self.calls.append(("batch", list(texts)))
        return [self._wav(t) for t in texts]


def test_wav_bytes_roundtrip():
    data = np.sin(np.linspace(0, 20, 2400)).astype(np.float32) * 0.5
    blob = wav_bytes(data, 24000)
    with wave.open(io.BytesIO(blob)) as f:
        assert f.getframerate() == 24000
        assert f.getnchannels() == 1
        assert f.getnframes() == 2400
        pcm = np.frombuffer(f.readframes(2400), np.int16)
    np.testing.assert_allclose(pcm / 32767.0, data, atol=1 / 32000)


def test_batcher_fuses_concurrent_requests():
    syn = FakeSynthesizer()
    b = Batcher(syn, max_batch=8, window_ms=200)
    try:
        reqs = [_Request(text=f"t{i}", ref_s=None, params=_params())
                for i in range(4)]
        threads = [threading.Thread(target=b.submit, args=(r,)) for r in reqs]
        for t in threads:
            t.start()
        for t in threads:
            t.join(10)
        assert all(r.wav is not None and r.error is None for r in reqs)
        # all four landed in ONE batched dispatch (window >> submit skew)
        kinds = [k for k, _ in syn.calls]
        assert kinds == ["batch"]
        assert sorted(syn.calls[0][1]) == ["t0", "t1", "t2", "t3"]
    finally:
        b.close()


def test_batcher_splits_incompatible_params():
    syn = FakeSynthesizer()
    b = Batcher(syn, max_batch=8, window_ms=150)
    try:
        r1 = _Request(text="a", ref_s=None, params=_params(steps=5))
        r2 = _Request(text="b", ref_s=None, params=_params(steps=10))
        threads = [threading.Thread(target=b.submit, args=(r,))
                   for r in (r1, r2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(10)
        assert r1.error is None and r2.error is None
        # different sampler settings never share a dispatch
        assert all(len(texts) == 1 for _, texts in syn.calls)
        assert len(syn.calls) == 2
    finally:
        b.close()


def test_batcher_surfaces_errors_per_request():
    class Boom(FakeSynthesizer):
        def inference(self, *a, **kw):
            raise RuntimeError("decoder exploded")

    b = Batcher(Boom(), max_batch=1, window_ms=1)
    try:
        r = b.submit(_Request(text="x", ref_s=None, params=_params()))
        assert r.wav is None
        assert "decoder exploded" in r.error
    finally:
        b.close()


def _post(port, obj, path="/tts"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            return resp.status, resp.headers.get("Content-Type"), resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type"), e.read()


def test_http_endpoints_with_fake_synth():
    server = TTSServer(FakeSynthesizer(), voices={"v": np.zeros((1, 256), np.float32)})
    port = server.start_background()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=10
        ) as resp:
            health = json.loads(resp.read())
        assert health["status"] == "ok"
        assert health["voices"] == ["v"]

        code, ctype, body = _post(port, {"text": "həlˈoʊ", "voice": "v"})
        assert code == 200 and ctype == "audio/wav"
        with wave.open(io.BytesIO(body)) as f:
            assert f.getframerate() == 24000 and f.getnframes() > 0

        code, _, body = _post(port, {"voice": "v"})  # no text
        assert code == 400 and b"text" in body
        code, _, _ = _post(port, {"text": "x", "voice": "nope"})
        assert code == 400
    finally:
        server.close()


@pytest.mark.slow
def test_http_end_to_end_tiny_model():
    """Two concurrent requests through the real pipeline (tiny config,
    random weights) come back as valid 24 kHz WAVs and share one batch."""
    from styletts2_tpu.config import Config
    from styletts2_tpu.inference import Synthesizer

    cfg = Config()
    cfg.plbert_params.num_hidden_layers = 1
    cfg.model_params.diffusion.transformer.num_layers = 1
    server = TTSServer(Synthesizer(cfg, seed=0), max_batch=4, window_ms=3000)
    port = server.start_background()
    try:
        results = {}

        def go(name, text):
            results[name] = _post(port, {"text": text, "diffusion_steps": 3})

        threads = [
            threading.Thread(target=go, args=("a", "ðɪs ɪz ɐ tˈɛst.")),
            threading.Thread(target=go, args=("b", "sˈɛkənd lˈaɪn.")),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(600)
        for name in ("a", "b"):
            code, ctype, body = results[name]
            assert code == 200 and ctype == "audio/wav"
            with wave.open(io.BytesIO(body)) as f:
                assert f.getframerate() == 24000
                pcm = np.frombuffer(f.readframes(f.getnframes()), np.int16)
            assert len(pcm) > 600
            assert np.isfinite(pcm.astype(np.float32)).all()
        assert server.batcher.stats["batched_requests"] >= 2
    finally:
        server.close()
