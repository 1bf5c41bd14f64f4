"""DFDNet building blocks (reference: basicsr/archs/dfdnet_util.py:8-162).

The reference's custom ``BlurFunction`` exists only for a memory-efficient
backward; numerically it is a plain depthwise binomial blur, which XLA
fuses/differentiates fine on its own.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .hifacegan_util import SNConv2d

_BLUR_KERNEL = np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], np.float32) / 16.0


def blur(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 binomial depthwise blur, padding 1 (reference dfdnet_util.py:8-55)."""
    c = x.shape[-1]
    kernel = jnp.asarray(_BLUR_KERNEL)[:, :, None, None] * jnp.ones((1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'), feature_group_count=c)


def calc_mean_std(feat: jnp.ndarray, eps: float = 1e-5):
    """Per-sample/channel mean + std over (H, W); NHWC
    (reference dfdnet_util.py:58-73). Uses torch's unbiased variance."""
    n, h, w, c = feat.shape
    flat = feat.reshape(n, h * w, c)
    mean = jnp.mean(flat, axis=1, keepdims=True)
    var = jnp.var(flat, axis=1, keepdims=True) * (h * w) / max(h * w - 1, 1)
    return mean[:, None], jnp.sqrt(var + eps)[:, None]  # (n,1,1,c)


def adaptive_instance_normalization(content_feat, style_feat):
    """AdaIN: re-statistic content features to match style features
    (reference dfdnet_util.py:76-90)."""
    style_mean, style_std = calc_mean_std(style_feat)
    content_mean, content_std = calc_mean_std(content_feat)
    normalized = (content_feat - content_mean) / content_std
    return normalized * style_std + style_mean


class AttentionBlock(nn.Module):
    """SNConv-lrelu-SNConv (reference dfdnet_util.py:93-97). Conv names match
    the torch Sequential indices."""
    in_channel: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        h = SNConv2d(self.in_channel, 3, 1, 1, dtype=self.dtype, name='0')(x)
        h = nn.leaky_relu(h, 0.2)
        return SNConv2d(self.in_channel, 3, 1, 1, dtype=self.dtype, name='2')(h)


class MSDilationBlock(nn.Module):
    """Multi-scale dilation block (reference dfdnet_util.py:126-148). Conv
    names are the torch Sequential paths flattened (``conv_blocks_{i}_{j}``)
    so checkpoints convert key-for-key."""
    in_channels: int
    kernel_size: int = 3
    dilation: tuple = (1, 1, 1, 1)
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        outs = []
        for i in range(4):
            pad = ((self.kernel_size - 1) // 2) * self.dilation[i]
            h = SNConv2d(self.in_channels, self.kernel_size, 1, pad,
                         use_bias=self.use_bias, dilation=self.dilation[i],
                         dtype=self.dtype, name=f'conv_blocks_{i}_0')(x)
            h = nn.leaky_relu(h, 0.2)
            h = SNConv2d(self.in_channels, self.kernel_size, 1, pad,
                         use_bias=self.use_bias, dilation=self.dilation[i],
                         dtype=self.dtype, name=f'conv_blocks_{i}_2')(h)
            outs.append(h)
        out = jnp.concatenate(outs, axis=-1)
        out = SNConv2d(self.in_channels, self.kernel_size, 1,
                       (self.kernel_size - 1) // 2, use_bias=self.use_bias,
                       dtype=self.dtype, name='conv_fusion')(out)
        return out + x


class UpResBlock(nn.Module):
    """(reference dfdnet_util.py:151-162)"""
    in_channel: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.in_channel, (3, 3), padding=1, dtype=self.dtype, name='body_0')(x)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.in_channel, (3, 3), padding=1, dtype=self.dtype, name='body_2')(h)
        return x + h
