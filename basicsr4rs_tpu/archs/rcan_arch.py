"""RCAN — Residual Channel Attention Networks
(reference: basicsr/archs/rcan_arch.py:8-140)."""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..utils.registry import ARCH_REGISTRY
from .arch_util import ChannelAttention, Upsample


class RCAB(nn.Module):
    """Residual channel attention block: conv-relu-conv-CA + skip."""
    num_feat: int
    squeeze_factor: int = 16
    res_scale: float = 1.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        res = nn.Conv(self.num_feat, (3, 3), dtype=self.dtype, name='conv1')(x)
        res = nn.relu(res)
        res = nn.Conv(self.num_feat, (3, 3), dtype=self.dtype, name='conv2')(res)
        res = ChannelAttention(self.num_feat, self.squeeze_factor, dtype=self.dtype, name='ca')(res)
        return x + res * self.res_scale


class ResidualGroup(nn.Module):
    num_feat: int
    num_block: int
    squeeze_factor: int = 16
    res_scale: float = 1.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        res = x
        for i in range(self.num_block):
            res = RCAB(self.num_feat, self.squeeze_factor, self.res_scale,
                       dtype=self.dtype, name=f'residual_group_{i}')(res)
        res = nn.Conv(self.num_feat, (3, 3), dtype=self.dtype, name='conv')(res)
        return x + res


@ARCH_REGISTRY.register()
class RCAN(nn.Module):
    # torch key remaps: RCAB sequential indices and CA attention indices.
    TORCH_KEY_RULES = (
        (r'\.rcab\.0\.', '.conv1.'),
        (r'\.rcab\.2\.', '.conv2.'),
        (r'\.rcab\.3\.attention\.1\.', '.ca.squeeze.'),
        (r'\.rcab\.3\.attention\.3\.', '.ca.excite.'),
        (r'^upsample\.(\d+)\.', lambda m: f'upsample.conv{int(m.group(1)) // 2}.'),
    )

    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_group: int = 10
    num_block: int = 16
    squeeze_factor: int = 16
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
        res = feat
        for g in range(self.num_group):
            res = ResidualGroup(self.num_feat, self.num_block, self.squeeze_factor,
                                self.res_scale, dtype=self.dtype, name=f'body_{g}')(res)
        res = nn.Conv(self.num_feat, (3, 3), dtype=self.dtype, name='conv_after_body')(res)
        feat = feat + res

        out = Upsample(self.upscale, self.num_feat, dtype=self.dtype, name='upsample')(feat)
        out = nn.Conv(self.num_out_ch, (3, 3), dtype=self.dtype, name='conv_last')(out)
        return out / self.img_range + mean
