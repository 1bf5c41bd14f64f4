"""RRDBNet — ESRGAN / Real-ESRGAN generator
(reference: basicsr/archs/rrdbnet_arch.py:9-130). Supports scale 1/2 inputs
via pixel_unshuffle; nearest-upsample between up-convs."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..utils.registry import ARCH_REGISTRY
from .arch_util import pixel_unshuffle, resize_nearest, scaled_kaiming_init


class ResidualDenseBlock(nn.Module):
    """5-conv dense block, 0.2-scaled residual (reference rrdbnet_arch.py:9-39)."""
    num_feat: int = 64
    num_grow_ch: int = 32
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        init01 = scaled_kaiming_init(0.1)

        def conv(name, v, out):
            return nn.Conv(out, (3, 3), kernel_init=init01, dtype=self.dtype, name=name)(v)

        lrelu = lambda v: nn.leaky_relu(v, negative_slope=0.2)  # noqa: E731
        x1 = lrelu(conv('conv1', x, self.num_grow_ch))
        x2 = lrelu(conv('conv2', jnp.concatenate((x, x1), -1), self.num_grow_ch))
        x3 = lrelu(conv('conv3', jnp.concatenate((x, x1, x2), -1), self.num_grow_ch))
        x4 = lrelu(conv('conv4', jnp.concatenate((x, x1, x2, x3), -1), self.num_grow_ch))
        x5 = conv('conv5', jnp.concatenate((x, x1, x2, x3, x4), -1), self.num_feat)
        return x5 * 0.2 + x


class RRDB(nn.Module):
    """Residual-in-residual dense block (reference rrdbnet_arch.py:42-64)."""
    num_feat: int
    num_grow_ch: int = 32
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch, dtype=self.dtype, name='rdb1')(x)
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch, dtype=self.dtype, name='rdb2')(out)
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch, dtype=self.dtype, name='rdb3')(out)
        return out * 0.2 + x


@ARCH_REGISTRY.register()
class RRDBNet(nn.Module):
    num_in_ch: int = 3
    num_out_ch: int = 3
    scale: int = 4
    num_feat: int = 64
    num_block: int = 23
    num_grow_ch: int = 32
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        if self.scale == 2:
            feat_in = pixel_unshuffle(x, 2)
        elif self.scale == 1:
            feat_in = pixel_unshuffle(x, 4)
        else:
            feat_in = x
        feat = nn.Conv(self.num_feat, (3, 3), dtype=self.dtype, name='conv_first')(feat_in)
        body = feat
        for i in range(self.num_block):
            body = RRDB(self.num_feat, self.num_grow_ch, dtype=self.dtype, name=f'body_{i}')(body)
        body = nn.Conv(self.num_feat, (3, 3), dtype=self.dtype, name='conv_body')(body)
        feat = feat + body
        # upsample
        lrelu = lambda v: nn.leaky_relu(v, negative_slope=0.2)  # noqa: E731
        feat = lrelu(nn.Conv(self.num_feat, (3, 3), dtype=self.dtype, name='conv_up1')(
            resize_nearest(feat, 2)))
        feat = lrelu(nn.Conv(self.num_feat, (3, 3), dtype=self.dtype, name='conv_up2')(
            resize_nearest(feat, 2)))
        out = nn.Conv(self.num_out_ch, (3, 3), dtype=self.dtype, name='conv_last')(
            lrelu(nn.Conv(self.num_feat, (3, 3), dtype=self.dtype, name='conv_hr')(feat)))
        return out
