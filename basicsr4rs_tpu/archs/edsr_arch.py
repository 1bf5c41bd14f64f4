"""EDSR (reference: basicsr/archs/edsr_arch.py:9-90).

Residual blocks with ``res_scale`` (no BN), global residual, pixel-shuffle
upsampler, and the DIV2K mean-shift: subtract dataset RGB mean * img_range at
input, add back at output.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..utils.registry import ARCH_REGISTRY
from .arch_util import ResidualBlockNoBN, Upsample


@ARCH_REGISTRY.register()
class EDSR(nn.Module):
    # torch Sequential upsampler indices (0, 2 -> conv0, conv1) for
    # reference-checkpoint conversion.
    TORCH_KEY_RULES = ((r'^upsample\.(\d+)\.', lambda m: f'upsample.conv{int(m.group(1)) // 2}.'),)

    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_block: int = 16
    upscale: int = 4
    res_scale: float = 1.0
    img_range: float = 255.
    rgb_mean: Tuple[float, float, float] = (0.4488, 0.4371, 0.4040)
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        mean = jnp.asarray(self.rgb_mean, dtype=x.dtype)
        x = (x - mean) * self.img_range

        feat = nn.Conv(self.num_feat, (3, 3), dtype=self.dtype, name='conv_first')(x)
        body = feat
        for i in range(self.num_block):
            body = ResidualBlockNoBN(self.num_feat, res_scale=self.res_scale,
                                     dtype=self.dtype, name=f'body_{i}')(body)
        body = nn.Conv(self.num_feat, (3, 3), dtype=self.dtype, name='conv_after_body')(body)
        feat = feat + body

        out = Upsample(self.upscale, self.num_feat, dtype=self.dtype, name='upsample')(feat)
        out = nn.Conv(self.num_out_ch, (3, 3), dtype=self.dtype, name='conv_last')(out)

        return out / self.img_range + mean
