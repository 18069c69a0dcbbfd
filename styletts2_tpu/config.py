"""Config system mirroring the reference YAML schema 1:1.

Reference: /root/reference/Configs/config.yml plus utils.py:63-69
(recursive_munch) — here re-done as typed dataclasses so reference YAML
configs load unchanged while giving static structure for jit closures.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import yaml


def _filter_kwargs(cls, d: Dict[str, Any]) -> Dict[str, Any]:
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in d.items() if k in names}


def _sub(cls, d: Optional[Dict[str, Any]]):
    d = d or {}
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name in d:
            v = d[f.name]
            if dataclasses.is_dataclass(f.type) or (
                isinstance(f.default_factory, type)
                and dataclasses.is_dataclass(f.default_factory)
            ):
                kwargs[f.name] = _sub(f.default_factory, v)
            else:
                kwargs[f.name] = v
    return cls(**_filter_kwargs(cls, kwargs))


@dataclass
class SpectParams:
    n_fft: int = 2048
    win_length: int = 1200
    hop_length: int = 300


@dataclass
class PreprocessParams:
    sr: int = 24000
    spect_params: SpectParams = field(default_factory=SpectParams)


@dataclass
class DataParams:
    train_data: str = "Data/train_list.txt"
    val_data: str = "Data/val_list.txt"
    root_path: str = ""
    OOD_data: str = "Data/OOD_texts.txt"
    min_length: int = 50


@dataclass
class DecoderParams:
    type: str = "istftnet"  # 'istftnet' | 'hifigan'
    resblock_kernel_sizes: List[int] = field(default_factory=lambda: [3, 7, 11])
    upsample_rates: List[int] = field(default_factory=lambda: [10, 6])
    upsample_initial_channel: int = 512
    resblock_dilation_sizes: List[List[int]] = field(
        default_factory=lambda: [[1, 3, 5], [1, 3, 5], [1, 3, 5]]
    )
    upsample_kernel_sizes: List[int] = field(default_factory=lambda: [20, 12])
    gen_istft_n_fft: int = 20
    gen_istft_hop_size: int = 5


@dataclass
class SLMParams:
    model: str = "microsoft/wavlm-base-plus"
    sr: int = 16000
    hidden: int = 768
    nlayers: int = 13
    initial_channel: int = 64


@dataclass
class DiffusionTransformerParams:
    num_layers: int = 3
    num_heads: int = 8
    head_features: int = 64
    multiplier: int = 2


@dataclass
class DiffusionDistParams:
    sigma_data: float = 0.2
    estimate_sigma_data: bool = True
    mean: float = -3.0
    std: float = 1.0


@dataclass
class DiffusionParams:
    embedding_mask_proba: float = 0.1
    transformer: DiffusionTransformerParams = field(
        default_factory=DiffusionTransformerParams
    )
    dist: DiffusionDistParams = field(default_factory=DiffusionDistParams)


@dataclass
class ModelParams:
    multispeaker: bool = False
    dim_in: int = 64
    hidden_dim: int = 512
    max_conv_dim: int = 512
    n_layer: int = 3
    n_mels: int = 80
    n_token: int = 178
    max_dur: int = 50
    style_dim: int = 128
    dropout: float = 0.2
    decoder: DecoderParams = field(default_factory=DecoderParams)
    slm: SLMParams = field(default_factory=SLMParams)
    diffusion: DiffusionParams = field(default_factory=DiffusionParams)


@dataclass
class LossParams:
    lambda_mel: float = 5.0
    lambda_gen: float = 1.0
    lambda_slm: float = 1.0
    lambda_mono: float = 1.0
    lambda_s2s: float = 1.0
    TMA_epoch: int = 50
    lambda_F0: float = 1.0
    lambda_norm: float = 1.0
    lambda_dur: float = 1.0
    lambda_ce: float = 20.0
    lambda_sty: float = 1.0
    lambda_diff: float = 1.0
    diff_epoch: int = 20
    joint_epoch: int = 50


@dataclass
class OptimizerParams:
    lr: float = 1e-4
    bert_lr: float = 1e-5
    ft_lr: float = 1e-5


@dataclass
class SLMAdvParams:
    min_len: int = 400
    max_len: int = 500
    batch_percentage: float = 0.5
    iter: int = 10
    thresh: int = 5
    scale: float = 0.01
    sig: float = 1.5


@dataclass
class PLBERTParams:
    """PL-BERT (phoneme-level ALBERT) architecture.

    Reference: /root/reference/Utils/PLBERT/config.yml model_params.
    """

    vocab_size: int = 178
    hidden_size: int = 768
    num_attention_heads: int = 12
    intermediate_size: int = 2048
    max_position_embeddings: int = 512
    num_hidden_layers: int = 12
    dropout: float = 0.1
    embedding_size: int = 128  # HF AlbertConfig default


@dataclass
class Config:
    log_dir: str = "Models/LJSpeech"
    first_stage_path: str = "first_stage.pth"
    save_freq: int = 2
    log_interval: int = 10
    device: str = "tpu"
    epochs_1st: int = 200
    epochs_2nd: int = 100
    batch_size: int = 16
    max_len: int = 400
    pretrained_model: str = ""
    second_stage_load_pretrained: bool = True
    load_only_params: bool = False
    # '' (full f32) | 'bf16': bf16 activations/compute in the FLOP-heavy
    # modules (decoder, discriminators, WavLM, style encoders) with f32
    # master weights + optimizer state and f32 losses — the TPU analog of
    # the reference's fp16 accelerate finetune driver
    # (train_finetune_accelerate.py:33-35). bf16 shares f32's exponent
    # range, so no GradScaler is needed.
    mixed_precision: str = ""
    # static decoder/GAN clip bucket granularity AND floor, in mel-half
    # frames: clip_len = max(B, floor_to_B(min(half-1, max_len//2))). The
    # reference slices dynamic per-batch clips (train_first.py:216-243);
    # static shapes need a bucket. 40 (= 0.6 s of audio, 24000 samples)
    # matches the reference's practical minimum; the multi-chip dryrun
    # shrinks it to cut the 1-core step cost (parallel/dryrun.py).
    clip_frame_bucket: int = 40
    # Rematerialize (jax.checkpoint) the decoder in training steps: its
    # 24 kHz-rate activations dominate step memory (a batch-16 max_len-400
    # f32 stage-1 step needs ~25 G HBM without remat vs ~16 G per v5e chip);
    # remat trades one extra decoder forward for dropping them all. Training
    # only — inference never differentiates, so the flag has no effect there.
    remat_decoder: bool = False

    F0_path: str = "Utils/JDC/bst.t7"
    ASR_config: str = "Utils/ASR/config.yml"
    ASR_path: str = "Utils/ASR/epoch_00080.pth"
    PLBERT_dir: str = "Utils/PLBERT/"

    data_params: DataParams = field(default_factory=DataParams)
    preprocess_params: PreprocessParams = field(default_factory=PreprocessParams)
    model_params: ModelParams = field(default_factory=ModelParams)
    loss_params: LossParams = field(default_factory=LossParams)
    optimizer_params: OptimizerParams = field(default_factory=OptimizerParams)
    slmadv_params: SLMAdvParams = field(default_factory=SLMAdvParams)
    plbert_params: PLBERTParams = field(default_factory=PLBERTParams)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Config":
        kwargs: Dict[str, Any] = {}
        for f in dataclasses.fields(cls):
            if f.name not in d:
                continue
            v = d[f.name]
            default = f.default_factory if f.default_factory is not dataclasses.MISSING else None
            if default is not None and dataclasses.is_dataclass(default) and isinstance(v, dict):
                kwargs[f.name] = _from_nested(default, v)
            else:
                kwargs[f.name] = v
        return cls(**kwargs)

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


def _from_nested(cls, d: Dict[str, Any]):
    kwargs: Dict[str, Any] = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        default = f.default_factory if f.default_factory is not dataclasses.MISSING else None
        if default is not None and dataclasses.is_dataclass(default) and isinstance(v, dict):
            kwargs[f.name] = _from_nested(default, v)
        else:
            kwargs[f.name] = v
    return cls(**_filter_kwargs(cls, kwargs))


def load_config(path: str) -> Config:
    """Load a reference-format YAML config (Configs/*.yml compatible)."""
    with open(path) as f:
        raw = yaml.safe_load(f)
    return Config.from_dict(raw)


def load_config_dict(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f)
