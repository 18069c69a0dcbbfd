"""Host-side data pipeline: file lists, audio IO, batching with shape buckets.

Reference semantics (meldataset.py): train lists are `path|phonemes|speaker`
lines; waves are padded with 5000 zeros both ends, mel length truncated to
even; each item also carries an OOD ref text (≥ min_length chars) and a
same-speaker reference mel clipped to 192 frames; the collater zero-pads and
sorts by mel length.

TPU-native differences: mels are computed *on device* inside the jitted
step (ops/stft.preprocess_mel), so the host only ships int16-decoded
waveforms, token ids and lengths; text/mel lengths are bucketed to a small
set of static shapes so every step hits a cached XLA executable; per-batch
random clip starts are drawn host-side and shipped as arrays (replacing the
per-item python slicing loops, train_first.py:225-238).
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from styletts2_tpu.text import TextCleaner
from styletts2_tpu.utils import read_wav, resample_linear

HOP = 300
PAD_SAMPLES = 5000


def load_data_list(path: str) -> List[Tuple[str, str, int]]:
    items = []
    with open(path, encoding="utf-8", errors="ignore") as f:
        for line in f:
            parts = line.strip().split("|")
            if len(parts) >= 3:
                items.append((parts[0], parts[1], int(parts[2])))
            elif len(parts) == 2:
                items.append((parts[0], parts[1], 0))
    return items


def _bucket(n: int, step: int, lo: int, hi: Optional[int] = None) -> int:
    b = max(lo, ((n + step - 1) // step) * step)
    return min(b, hi) if hi is not None else b


@dataclass
class Batch:
    """One host batch; everything fixed-shape numpy, device-ready."""

    waves: np.ndarray  # (B, T_wav) float32, zero-padded
    wave_lengths: np.ndarray  # (B,)
    tokens: np.ndarray  # (B, T_text) int32
    input_lengths: np.ndarray  # (B,)
    ref_tokens: np.ndarray  # (B, T_ref) int32 (OOD texts)
    ref_lengths: np.ndarray  # (B,)
    mel_lengths: np.ndarray  # (B,) even mel frame counts
    ref_waves: np.ndarray  # (B, T_refwav) same-speaker reference audio
    ref_wave_lengths: np.ndarray  # (B,)
    speakers: np.ndarray  # (B,)


class FilePathDataset:
    def __init__(
        self,
        data_list: Sequence[Tuple[str, str, int]],
        root_path: str,
        sr: int = 24000,
        ood_texts: Optional[List[str]] = None,
        min_length: int = 50,
        validation: bool = False,
        max_mel_length: int = 192,
    ):
        self.data = list(data_list)
        self.root = root_path
        self.sr = sr
        self.cleaner = TextCleaner()
        self.min_length = min_length
        self.validation = validation
        self.max_mel_length = max_mel_length
        self.ood = ood_texts or []
        self.by_speaker: Dict[int, List[int]] = {}
        for i, (_, _, spk) in enumerate(self.data):
            self.by_speaker.setdefault(spk, []).append(i)

    def __len__(self):
        return len(self.data)

    def load_wave(self, path: str) -> np.ndarray:
        wave, sr = read_wav(os.path.join(self.root, path))
        if sr != self.sr:
            wave = resample_linear(wave, sr, self.sr)
        return np.concatenate(
            [np.zeros(PAD_SAMPLES, np.float32), wave, np.zeros(PAD_SAMPLES, np.float32)]
        )

    def tokenize(self, text: str) -> np.ndarray:
        ids = self.cleaner(text)
        return np.asarray([0] + ids + [0], np.int32)

    def sample_ood(self, rng: random.Random) -> np.ndarray:
        ps = ""
        guard = 0
        while len(ps) < self.min_length and self.ood:
            ps = self.ood[rng.randrange(len(self.ood))]
            guard += 1
            if guard > 100:
                break
        return self.tokenize(ps) if ps else np.asarray([0, 0], np.int32)

    def get_item(self, idx: int, rng: random.Random):
        path, text, spk = self.data[idx]
        wave = self.load_wave(path)
        tokens = self.tokenize(text)
        mel_len = wave.shape[0] // HOP + 1
        mel_len -= mel_len % 2
        ref_idx = rng.choice(self.by_speaker[spk])
        ref_wave = self.load_wave(self.data[ref_idx][0])
        # clip reference to max_mel_length frames of audio
        max_ref = self.max_mel_length * HOP
        if ref_wave.shape[0] > max_ref:
            start = rng.randrange(ref_wave.shape[0] - max_ref)
            ref_wave = ref_wave[start : start + max_ref]
        return {
            "wave": wave,
            "tokens": tokens,
            "mel_len": mel_len,
            "ref_wave": ref_wave,
            "ref_tokens": self.sample_ood(rng),
            "speaker": spk,
        }


class DataLoader:
    """Bucketed batch iterator (shuffling, drop-last for training)."""

    def __init__(
        self,
        dataset: FilePathDataset,
        batch_size: int = 16,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 1,
        text_bucket: int = 32,
        wave_bucket: int = 2 * 24000,
    ):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.text_bucket = text_bucket
        self.wave_bucket = wave_bucket
        self.epoch = 0

    def __len__(self):
        n = len(self.ds) // self.batch_size
        return n if self.drop_last else -(-len(self.ds) // self.batch_size)

    def __iter__(self) -> Iterator[Batch]:
        rng = random.Random(self.seed + self.epoch)
        order = list(range(len(self.ds)))
        if self.shuffle:
            rng.shuffle(order)
        self.epoch += 1
        bs = self.batch_size
        for i in range(0, len(order) - (bs - 1 if self.drop_last else 0), bs):
            idxs = order[i : i + bs]
            items = [self.ds.get_item(j, rng) for j in idxs]
            yield self.collate(items)

    def collate(self, items) -> Batch:
        B = len(items)
        t_max = _bucket(max(len(it["tokens"]) for it in items), self.text_bucket, self.text_bucket)
        r_max = _bucket(max(len(it["ref_tokens"]) for it in items), self.text_bucket, self.text_bucket)
        w_max = _bucket(max(len(it["wave"]) for it in items), self.wave_bucket, self.wave_bucket)
        rw_max = _bucket(max(len(it["ref_wave"]) for it in items), self.wave_bucket, self.wave_bucket)

        waves = np.zeros((B, w_max), np.float32)
        wave_lengths = np.zeros(B, np.int32)
        tokens = np.zeros((B, t_max), np.int32)
        input_lengths = np.zeros(B, np.int32)
        ref_tokens = np.zeros((B, r_max), np.int32)
        ref_lengths = np.zeros(B, np.int32)
        mel_lengths = np.zeros(B, np.int32)
        ref_waves = np.zeros((B, rw_max), np.float32)
        ref_wave_lengths = np.zeros(B, np.int32)
        speakers = np.zeros(B, np.int32)

        for b, it in enumerate(items):
            w, tk, rw, rt = it["wave"], it["tokens"], it["ref_wave"], it["ref_tokens"]
            waves[b, : len(w)] = w
            wave_lengths[b] = len(w)
            tokens[b, : len(tk)] = tk
            input_lengths[b] = len(tk)
            ref_tokens[b, : len(rt)] = rt
            ref_lengths[b] = len(rt)
            mel_lengths[b] = it["mel_len"]
            ref_waves[b, : len(rw)] = rw
            ref_wave_lengths[b] = len(rw)
            speakers[b] = it["speaker"]

        return Batch(
            waves=waves, wave_lengths=wave_lengths, tokens=tokens,
            input_lengths=input_lengths, ref_tokens=ref_tokens,
            ref_lengths=ref_lengths, mel_lengths=mel_lengths,
            ref_waves=ref_waves, ref_wave_lengths=ref_wave_lengths,
            speakers=speakers,
        )


def build_dataloader(
    path_list: str,
    root_path: str,
    ood_path: Optional[str] = None,
    min_length: int = 50,
    batch_size: int = 16,
    validation: bool = False,
    seed: int = 1,
) -> DataLoader:
    """Reference build_dataloader equivalent (meldataset.py:233-254)."""
    data = load_data_list(path_list)
    ood_texts = None
    if ood_path and os.path.exists(ood_path):
        with open(ood_path, encoding="utf-8", errors="ignore") as f:
            lines = f.readlines()
        if lines:
            idx = 1 if ".wav" in lines[0].split("|")[0] else 0
            ood_texts = [l.split("|")[idx].strip() for l in lines if l.strip()]
    ds = FilePathDataset(
        data, root_path, ood_texts=ood_texts, min_length=min_length,
        validation=validation,
    )
    return DataLoader(
        ds, batch_size=batch_size, shuffle=not validation,
        drop_last=not validation, seed=seed,
    )
