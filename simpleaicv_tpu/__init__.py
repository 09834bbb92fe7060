"""simpleaicv_tpu: a TPU-native (JAX/XLA/Pallas/pjit) computer-vision training framework.

Re-designed from scratch with the capabilities of the PyTorch reference
`zgcr/SimpleAICV-pytorch-ImageNet-COCO-training` (see SURVEY.md): a multi-task
model zoo + losses + decoders + datasets + one SPMD training engine.

Architecture (TPU-first, not a port):
  * models are `flax.linen` modules in NHWC layout, bf16 compute / f32 params;
  * a single `core.engine.Trainer` replaces the reference's 26 per-task DDP
    drivers (reference `tools/train_*.py`), SPMD over a `jax.sharding.Mesh`;
  * collectives are XLA (`psum` etc.) inserted by `jit` from shardings — no
    NCCL-style explicit all_reduce/barrier calls;
  * all decode paths (NMS, CTC, samplers) are fixed-shape, on-device, jittable.
"""

__version__ = "0.1.0"

from . import models  # noqa: E402,F401  (registers the model zoo)
from . import losses  # noqa: E402,F401  (registers the loss zoo)
