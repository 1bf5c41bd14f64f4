"""ECBSR — edge-oriented re-parameterizable SR for mobile/edge deployment
(reference: basicsr/archs/ecbsr_arch.py:8-275).

Training forward sums five branches (plain 3x3, expand->3x3, and three fixed
edge filters scaled per channel); at deployment `rep_params` collapses every
ECB into a single 3x3 conv. Parameters keep the reference's names/layouts
(k0/b0/k1/b1/scale/bias, converted to HWIO) so reference checkpoints load
directly; the fixed sobel/laplacian masks are code constants, not params.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..utils.registry import ARCH_REGISTRY
from .arch_util import pixel_shuffle
from .srvgg_arch import PReLU


def _edge_mask(seq_type: str, out_channels: int) -> np.ndarray:
    """3x3 edge filter replicated per channel, HWIO depthwise (3,3,1,O)."""
    m = np.zeros((3, 3), np.float32)
    if seq_type == 'conv1x1-sobelx':
        m[:, 0] = [1., 2., 1.]
        m[:, 2] = [-1., -2., -1.]
    elif seq_type == 'conv1x1-sobely':
        m[0, :] = [1., 2., 1.]
        m[2, :] = [-1., -2., -1.]
    elif seq_type == 'conv1x1-laplacian':
        m[0, 1] = m[1, 0] = m[1, 2] = m[2, 1] = 1.
        m[1, 1] = -4.
    else:
        raise ValueError(seq_type)
    return np.tile(m[:, :, None, None], (1, 1, 1, out_channels))


def _conv(x, kernel, bias=None, groups=1, padding='VALID'):
    out = jax.lax.conv_general_dilated(x, kernel, (1, 1), padding,
                                       dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                                       feature_group_count=groups)
    if bias is not None:
        out = out + bias
    return out


def _pad_with_bias(y0, b0):
    """Pad 1px border whose value is the conv bias (the reference's
    explicit-bias-padding trick, ecbsr_arch.py:107-126)."""
    y = jnp.pad(y0, ((0, 0), (1, 1), (1, 1), (0, 0)))
    b = jnp.broadcast_to(b0, y[:, 0:1, :, :].shape)
    y = y.at[:, 0:1, :, :].set(b)
    y = y.at[:, -1:, :, :].set(b)
    y = y.at[:, :, 0:1, :].set(jnp.broadcast_to(b0, y[:, :, 0:1, :].shape))
    y = y.at[:, :, -1:, :].set(jnp.broadcast_to(b0, y[:, :, -1:, :].shape))
    return y


class SeqConv3x3(nn.Module):
    """(reference ecbsr_arch.py:8-156)"""
    seq_type: str
    in_channels: int
    out_channels: int
    depth_multiplier: float = 1.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        kinit = nn.initializers.variance_scaling(1 / 3, 'fan_in', 'uniform')  # torch conv default
        if self.seq_type == 'conv1x1-conv3x3':
            mid = int(self.out_channels * self.depth_multiplier)
            k0 = self.param('k0', kinit, (1, 1, self.in_channels, mid))
            b0 = self.param('b0', nn.initializers.zeros, (mid,))
            k1 = self.param('k1', kinit, (3, 3, mid, self.out_channels))
            b1 = self.param('b1', nn.initializers.zeros, (self.out_channels,))
            y0 = _conv(x, k0, b0)
            return _conv(_pad_with_bias(y0, b0), k1, b1)

        k0 = self.param('k0', kinit, (1, 1, self.in_channels, self.out_channels))
        b0 = self.param('b0', nn.initializers.zeros, (self.out_channels,))
        scale = self.param('scale', lambda rng, shape: jax.random.normal(rng, shape) * 1e-3,
                           (self.out_channels, 1, 1, 1))
        bias = self.param('bias', lambda rng, shape: jax.random.normal(rng, shape) * 1e-3,
                          (self.out_channels,))
        mask = jnp.asarray(_edge_mask(self.seq_type, self.out_channels), x.dtype)
        kernel = mask * scale.reshape(1, 1, 1, -1).astype(x.dtype)
        y0 = _conv(x, k0, b0)
        return _conv(_pad_with_bias(y0, b0), kernel, bias, groups=self.out_channels)


class ECB(nn.Module):
    """(reference ecbsr_arch.py:156-234)"""
    in_channels: int
    out_channels: int
    depth_multiplier: float
    act_type: str = 'prelu'
    with_idt: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name='conv3x3')(x)
        y = y + SeqConv3x3('conv1x1-conv3x3', self.in_channels, self.out_channels,
                           self.depth_multiplier, dtype=self.dtype, name='conv1x1_3x3')(x)
        y = y + SeqConv3x3('conv1x1-sobelx', self.in_channels, self.out_channels,
                           dtype=self.dtype, name='conv1x1_sbx')(x)
        y = y + SeqConv3x3('conv1x1-sobely', self.in_channels, self.out_channels,
                           dtype=self.dtype, name='conv1x1_sby')(x)
        y = y + SeqConv3x3('conv1x1-laplacian', self.in_channels, self.out_channels,
                           dtype=self.dtype, name='conv1x1_lpl')(x)
        if self.with_idt and self.in_channels == self.out_channels:
            y = y + x
        if self.act_type == 'prelu':
            y = PReLU(self.out_channels, name='act')(y)
        elif self.act_type == 'relu':
            y = nn.relu(y)
        elif self.act_type == 'softplus':
            y = jax.nn.softplus(y)
        elif self.act_type == 'linear':
            pass
        else:
            raise ValueError(f'activation {self.act_type} not supported')
        return y


@ARCH_REGISTRY.register()
class ECBSR(nn.Module):
    """(reference ecbsr_arch.py:236-275)"""
    num_in_ch: int = 1
    num_out_ch: int = 1
    num_block: int = 4
    num_channel: int = 16
    with_idt: bool = False
    act_type: str = 'prelu'
    scale: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = ECB(self.num_in_ch, self.num_channel, 2.0, self.act_type, self.with_idt,
                dtype=self.dtype, name='backbone_0')(x)
        for i in range(self.num_block):
            y = ECB(self.num_channel, self.num_channel, 2.0, self.act_type, self.with_idt,
                    dtype=self.dtype, name=f'backbone_{i + 1}')(y)
        y = ECB(self.num_channel, self.num_out_ch * self.scale**2, 2.0, 'linear',
                self.with_idt, dtype=self.dtype, name=f'backbone_{self.num_block + 1}')(y)
        shortcut = jnp.repeat(x, self.scale * self.scale, axis=-1)
        return pixel_shuffle(y + shortcut, self.scale)


def seqconv_rep_params(params: dict, seq_type: str, out_channels: int):
    """Collapse a SeqConv3x3 into one (3,3,I,O) kernel + bias
    (reference rep_params, ecbsr_arch.py:133-156)."""
    k0 = jnp.asarray(params['k0'])  # (1,1,I,M)
    b0 = jnp.asarray(params['b0'])
    if seq_type == 'conv1x1-conv3x3':
        k1 = jnp.asarray(params['k1'])  # (3,3,M,O)
        b1 = jnp.asarray(params['b1'])
    else:
        mask = jnp.asarray(_edge_mask(seq_type, out_channels))
        scale = jnp.asarray(params['scale']).reshape(1, 1, 1, -1)
        dw = mask * scale  # (3,3,1,O) depthwise
        # expand depthwise (3,3,O) to a diagonal full kernel (3,3,O_in,O_out)
        k1 = dw[:, :, 0, :, None] * jnp.eye(out_channels)[None, None, :, :]
        b1 = jnp.asarray(params['bias'])
    # fused kernel: 1x1 then 3x3 == 3x3 with channel-mixed input
    rep_w = jnp.einsum('abim,hwmo->hwio', k0, k1)
    # fused bias: 3x3 conv of a constant-b0 3x3 patch
    rep_b = jnp.einsum('m,hwmo->o', b0, jnp.asarray(k1)) + b1
    return rep_w, rep_b


def ecb_rep_params(params: dict, in_channels: int, out_channels: int, with_idt: bool):
    """Collapse an ECB into a single 3x3 conv (reference ecbsr_arch.py:215-234)."""
    w = jnp.asarray(params['conv3x3']['kernel'])
    b = jnp.asarray(params['conv3x3']['bias'])
    for name, seq_type in [('conv1x1_3x3', 'conv1x1-conv3x3'), ('conv1x1_sbx', 'conv1x1-sobelx'),
                           ('conv1x1_sby', 'conv1x1-sobely'), ('conv1x1_lpl', 'conv1x1-laplacian')]:
        wi, bi = seqconv_rep_params(params[name], seq_type, out_channels)
        w = w + wi
        b = b + bi
    if with_idt and in_channels == out_channels:
        idt = jnp.zeros_like(w)
        idt = idt.at[1, 1].set(jnp.eye(out_channels))
        w = w + idt
    return w, b
