from styletts2_tpu.ops import stft  # noqa: F401  (submodule; avoid name shadowing)
