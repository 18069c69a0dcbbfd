"""styletts2_tpu — a TPU-native (JAX/XLA/Pallas/pjit) StyleTTS 2 framework.

Built from scratch with the capabilities of yl4579/StyleTTS2 (reference at
/root/reference), redesigned TPU-first: static-shape jit inference, lax.scan
recurrences and diffusion, on-device monotonic alignment, data-parallel pjit
over a device Mesh, and Pallas kernels on the hot paths.
"""

__version__ = "0.1.0"

from styletts2_tpu.config import Config, load_config  # noqa: F401
