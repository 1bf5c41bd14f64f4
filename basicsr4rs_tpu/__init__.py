"""basicsr4rs_tpu — a TPU-native (JAX/XLA/Pallas/pjit) image & video
restoration framework with the capabilities of BasicSR4RS.

Layout convention: NHWC everywhere (TPU-native), params in float32 with an
optional bfloat16 compute policy, explicit `jax.random` key threading, and a
pure ``train_step(state, batch, rng) -> (state, logs)`` compiled once under
``jit`` over a device mesh.
"""

__version__ = '0.1.0'

# Re-export the public API at package level (the reference exposes the same
# flat namespace from basicsr/__init__.py).
from .archs import build_network  # noqa: F401,E402
from .data import build_dataloader, build_dataset  # noqa: F401,E402
from .losses import build_loss  # noqa: F401,E402
from .metrics import calculate_metric  # noqa: F401,E402
from .models import build_model  # noqa: F401,E402
from .utils import (ARCH_REGISTRY, DATASET_REGISTRY, LOSS_REGISTRY,  # noqa: F401,E402
                    METRIC_REGISTRY, MODEL_REGISTRY, get_root_logger, imwrite,
                    img2tensor, tensor2img)
