"""Finetune trainer: train_finetune.py semantics (SURVEY.md §3.4).

All losses active from epoch 0 (discriminators, TMA s2s/mono), styles from
ground-truth clips, text_aligner/text_encoder trained and stepped, diffusion
from diff_epoch, SLM-adversarial from joint_epoch. Set
`mixed_precision: bf16` in the config for bf16 mixed-precision training
(train/mp.py — the TPU analog of the reference's fp16 accelerate variant,
train_finetune_accelerate.py:33-35): bf16 compute in the FLOP-heavy modules,
f32 master weights/optimizer, no GradScaler needed.
"""

from __future__ import annotations

from styletts2_tpu.config import Config
from styletts2_tpu.models.build import TrainingModels
from styletts2_tpu.train.stage2 import Stage2Trainer
from styletts2_tpu.train.state import TrainState


class FinetuneTrainer(Stage2Trainer):
    def __init__(self, cfg: Config, models: TrainingModels, state: TrainState,
                 mesh=None):
        super().__init__(cfg, models, state, finetune=True, mesh=mesh)
