"""Observability: metrics logging (TensorBoard when available, JSONL always),
timing meters, and jax.profiler hooks.

Reference parity: TensorBoard scalars per loss term + file logging
(train_first.py:35-58, 310-319; SURVEY.md §5). TPU-native additions: a
step-time/RTF meter and a `trace` context manager around jax.profiler for
on-demand device profiles.
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import time
from typing import Dict, Optional


def get_logger(log_dir: str, name: str = "styletts2_tpu") -> logging.Logger:
    os.makedirs(log_dir, exist_ok=True)
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    if not logger.handlers:
        fh = logging.FileHandler(os.path.join(log_dir, "train.log"))
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(logging.Formatter("%(levelname)s:%(asctime)s: %(message)s"))
        logger.addHandler(fh)
        sh = logging.StreamHandler()
        sh.setLevel(logging.INFO)
        logger.addHandler(sh)
    return logger


class MetricsWriter:
    """Scalar/audio writer: TensorBoard (torch.utils.tensorboard) if present,
    plus an always-on metrics.jsonl."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self.tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter  # type: ignore

            self.tb = SummaryWriter(log_dir + "/tensorboard")
        except Exception:
            pass

    def scalars(self, tag_values: Dict[str, float], step: int):
        rec = {"step": step, "ts": time.time()}
        rec.update({k: float(v) for k, v in tag_values.items()})
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in tag_values.items():
                self.tb.add_scalar(k, float(v), step)

    _audio_write_warned = False

    def audio(self, tag: str, wav, step: int, sr: int = 24000):
        import numpy as np

        wav = np.asarray(wav)
        if self.tb is not None:
            self.tb.add_audio(tag, wav.reshape(1, -1), step, sample_rate=sr)
        # always-on on-disk copy (inspectable without TensorBoard)
        try:
            from styletts2_tpu.utils import write_wav

            adir = os.path.join(os.path.dirname(self.jsonl.name), "eval_audio")
            os.makedirs(adir, exist_ok=True)
            safe = tag.replace("/", "_")
            write_wav(
                os.path.join(adir, f"{safe}_step{step}.wav"),
                wav.astype(np.float32).ravel(), sr,
            )
        except Exception as e:
            # a persistent failure (full disk, bad path) must not be silent —
            # warn once so the promised on-disk copy's absence is explained
            if not MetricsWriter._audio_write_warned:
                MetricsWriter._audio_write_warned = True
                logging.getLogger("styletts2_tpu").warning(
                    "eval-audio write to disk failed (%s: %s); further "
                    "failures will be silent", type(e).__name__, e,
                )

    def figure_attention(self, tag: str, attn, step: int):
        if self.tb is not None:
            try:
                import matplotlib

                matplotlib.use("agg")
                import matplotlib.pyplot as plt

                fig = plt.figure()
                plt.imshow(attn, aspect="auto", origin="lower")
                self.tb.add_figure(tag, fig, step)
                plt.close(fig)
            except Exception:
                pass

    def close(self):
        self.jsonl.close()
        if self.tb is not None:
            self.tb.close()


class StepTimer:
    """Wall-clock per-step meter with EMA; reports steps/sec and, given audio
    seconds produced, training real-time factor."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg = None
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.avg = dt if self.avg is None else self.ema * self.avg + (1 - self.ema) * dt
        return dt


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace context (replaces the reference's wall-clock
    prints with real device profiles)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def nan_check(tree, logger: Optional[logging.Logger] = None) -> bool:
    """Debug-mode NaN detector replacing the reference's set_trace hook
    (train_second.py:455-457)."""
    import jax
    import numpy as np

    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            bad.append(jax.tree_util.keystr(path))
    if bad and logger:
        logger.error(f"non-finite values in: {bad[:10]}")
    return len(bad) == 0
