"""fused_leaky_relu — bias add + leaky ReLU x sqrt(2).

The reference implements this as a CUDA kernel (basicsr/ops/fused_act/
fused_bias_act_kernel.cu, 100 LoC + autograd wrapper). On TPU it is three
elementwise ops that XLA fuses automatically — the API is kept, the kernel is
unnecessary (SURVEY.md §2.6).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn


def fused_leaky_relu(x: jnp.ndarray, bias: Optional[jnp.ndarray] = None,
                     negative_slope: float = 0.2, scale: float = 2**0.5) -> jnp.ndarray:
    """(reference ops/fused_act/fused_act.py:94)"""
    if bias is not None:
        x = x + bias.astype(x.dtype)
    return nn.leaky_relu(x, negative_slope=negative_slope) * scale


class FusedLeakyReLU(nn.Module):
    """Learnable-bias variant (reference ops/fused_act/fused_act.py:81)."""
    num_channels: int
    negative_slope: float = 0.2
    scale: float = 2**0.5

    @nn.compact
    def __call__(self, x):
        bias = self.param('bias', nn.initializers.zeros, (self.num_channels,))
        return fused_leaky_relu(x, bias, self.negative_slope, self.scale)


def scaled_leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    """(reference stylegan2_arch.py:589-602)"""
    return nn.leaky_relu(x, negative_slope=negative_slope) * math.sqrt(2)
