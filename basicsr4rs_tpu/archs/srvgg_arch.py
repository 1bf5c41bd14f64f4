"""SRVGGNetCompact — Real-ESRGAN compact VGG-style SR network
(reference: basicsr/archs/srvgg_arch.py:8-70; suffix-registered)."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..utils.registry import ARCH_REGISTRY
from .arch_util import pixel_shuffle, resize_nearest


class PReLU(nn.Module):
    """Per-channel PReLU. The learnable slope is deliberately named 'kernel'
    so torch's ``body.N.weight`` converts without a special rule (it is 1D,
    untouched by the transpose logic)."""
    num_parameters: int

    @nn.compact
    def __call__(self, x):
        alpha = self.param('kernel', nn.initializers.constant(0.25), (self.num_parameters,))
        return jnp.where(x >= 0, x, x * alpha.astype(x.dtype))


@ARCH_REGISTRY.register()
@ARCH_REGISTRY.register(name='SRVGGNetCompact_basicsr4rs_tpu')
class SRVGGNetCompact(nn.Module):
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_conv: int = 16
    upscale: int = 4
    act_type: str = 'prelu'
    dtype: Any = None

    def _act(self, idx: int, v):
        if self.act_type == 'relu':
            return nn.relu(v)
        if self.act_type == 'prelu':
            return PReLU(self.num_feat, name=f'body_{idx}')(v)
        if self.act_type == 'leakyrelu':
            return nn.leaky_relu(v, negative_slope=0.1)
        raise ValueError(f'unsupported act_type {self.act_type}')

    @nn.compact
    def __call__(self, x):
        out = nn.Conv(self.num_feat, (3, 3), dtype=self.dtype, name='body_0')(x)
        out = self._act(1, out)
        idx = 2
        for _ in range(self.num_conv):
            out = nn.Conv(self.num_feat, (3, 3), dtype=self.dtype, name=f'body_{idx}')(out)
            out = self._act(idx + 1, out)
            idx += 2
        out = nn.Conv(self.num_out_ch * self.upscale**2, (3, 3), dtype=self.dtype,
                      name=f'body_{idx}')(out)
        out = pixel_shuffle(out, self.upscale)
        return out + resize_nearest(x, self.upscale)
