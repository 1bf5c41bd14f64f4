"""MSRResNet — modified SRResNet baseline (reference: basicsr/archs/srresnet_arch.py:9-100).

x2/x3/x4 SISR: first conv -> 16 residual blocks (no BN) -> pixel-shuffle
upsampling -> HR convs, plus a bilinear-upsampled input skip. x4 uses two
x2 shuffles; upconv layers get 0.1-scaled MSRA init like the reference.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..utils.registry import ARCH_REGISTRY
from .arch_util import ResidualBlockNoBN, pixel_shuffle, resize_bilinear, scaled_kaiming_init


@ARCH_REGISTRY.register()
class MSRResNet(nn.Module):
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_block: int = 16
    upscale: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        init01 = scaled_kaiming_init(0.1)
        feat = nn.Conv(self.num_feat, (3, 3), kernel_init=init01, dtype=self.dtype, name='conv_first')(x)
        feat = nn.leaky_relu(feat, negative_slope=0.1)

        body = feat
        for i in range(self.num_block):
            body = ResidualBlockNoBN(self.num_feat, dtype=self.dtype, name=f'body_{i}')(body)

        if self.upscale == 4:
            body = nn.Conv(self.num_feat * 4, (3, 3), kernel_init=init01, dtype=self.dtype, name='upconv1')(body)
            body = nn.leaky_relu(pixel_shuffle(body, 2), negative_slope=0.1)
            body = nn.Conv(self.num_feat * 4, (3, 3), kernel_init=init01, dtype=self.dtype, name='upconv2')(body)
            body = nn.leaky_relu(pixel_shuffle(body, 2), negative_slope=0.1)
        elif self.upscale in (2, 3):
            body = nn.Conv(self.num_feat * self.upscale**2, (3, 3), kernel_init=init01,
                           dtype=self.dtype, name='upconv1')(body)
            body = nn.leaky_relu(pixel_shuffle(body, self.upscale), negative_slope=0.1)
        else:
            raise ValueError(f'Unsupported upscale {self.upscale}; supported: 2, 3, 4.')

        out = nn.Conv(self.num_feat, (3, 3), kernel_init=init01, dtype=self.dtype, name='conv_hr')(body)
        out = nn.leaky_relu(out, negative_slope=0.1)
        out = nn.Conv(self.num_out_ch, (3, 3), kernel_init=init01, dtype=self.dtype, name='conv_last')(out)

        n, h, w, c = x.shape
        base = resize_bilinear(x, h * self.upscale, w * self.upscale, align_corners=False)
        return out + base
