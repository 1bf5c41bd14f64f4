"""Building blocks for HiFaceGAN: SPADE, LIP pooling, PatchGAN layers
(reference: basicsr/archs/hifacegan_util.py:12-255).

TPU-native notes
----------------
* Instance norm is computed inline per sample over (H, W) — no running
  buffers to thread through jit.
* Spectral norm reuses the stateless power-iteration kernel from
  ``discriminator_arch`` (fixed iteration count, deterministic start),
  so ``weight_orig`` torch checkpoints convert directly.
* ``lip2d`` is two average pools (numerator/denominator) that XLA fuses
  with the surrounding elementwise ops.
"""

from __future__ import annotations

import re
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .discriminator_arch import spectral_normalize


def nearest_resize_to(x: jnp.ndarray, size: Sequence[int]) -> jnp.ndarray:
    """torch ``F.interpolate(mode='nearest', size=...)`` for NHWC (exact
    index rule: ``src = floor(dst * in / out)``); static shapes."""
    n, h, w, c = x.shape
    th, tw = size
    if (th, tw) == (h, w):
        return x
    rows = np.floor(np.arange(th) * h / th).astype(np.int32)
    cols = np.floor(np.arange(tw) * w / tw).astype(np.int32)
    return jnp.take(jnp.take(x, rows, axis=1), cols, axis=2)


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Parameter-free instance norm over (H, W) per sample/channel."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def _avg_pool_3x3s2(x: jnp.ndarray, count_include_pad: bool = True) -> jnp.ndarray:
    """torch ``F.avg_pool2d(x, 3, 2, 1)``."""
    summed = jax.lax.reduce_window(x, 0., jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
                                   [(0, 0), (1, 1), (1, 1), (0, 0)])
    if count_include_pad:
        return summed / 9.
    ones = jnp.ones((1,) + x.shape[1:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(ones, 0., jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
                                   [(0, 0), (1, 1), (1, 1), (0, 0)])
    return summed / counts


def lip2d(x: jnp.ndarray, logit: jnp.ndarray) -> jnp.ndarray:
    """Local-importance pooling (reference hifacegan_util.py:273-275):
    importance-weighted 3x3/2 average."""
    weight = jnp.exp(logit)
    return _avg_pool_3x3s2(x * weight) / _avg_pool_3x3s2(weight)


class SNConv2d(nn.Module):
    """Spectral-normalized conv with explicit torch-style padding."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    pad: int = 1
    use_bias: bool = True
    dilation: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (k, k, x.shape[-1], self.features))
        kernel = spectral_normalize(kernel)
        out = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (self.stride, self.stride),
            [(self.pad, self.pad), (self.pad, self.pad)],
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        if self.use_bias:
            out = out + self.param('bias', nn.initializers.zeros,
                                   (self.features,)).astype(x.dtype)
        return out


class SPADE(nn.Module):
    """Spatially-adaptive (de)normalization (reference hifacegan_util.py:12-55).

    ``syncbatch`` falls back to instance norm exactly like the reference's
    single-device path; ``batch`` uses current-batch statistics (HiFaceGAN
    is documented to run in train mode even for eval, reference
    hifacegan_model.py:194-201)."""
    config_text: str
    norm_nc: int
    label_nc: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, segmap):
        parsed = re.search(r'spade(\D+)(\d)x\d', self.config_text)
        norm_type, ks = str(parsed.group(1)), int(parsed.group(2))
        if norm_type in ('instance', 'syncbatch'):
            normalized = instance_norm(x)
        elif norm_type == 'batch':
            mean = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
            var = jnp.var(x, axis=(0, 1, 2), keepdims=True)
            normalized = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        else:
            raise ValueError(f'{norm_type} is not a recognized param-free norm type in SPADE')

        nhidden = 128 if self.norm_nc > 128 else self.norm_nc
        pad = ks // 2
        segmap = nearest_resize_to(segmap, x.shape[1:3])
        actv = nn.relu(nn.Conv(nhidden, (ks, ks), padding=pad, dtype=self.dtype,
                               name='mlp_shared_0')(segmap))
        gamma = nn.Conv(self.norm_nc, (ks, ks), padding=pad, use_bias=False,
                        dtype=self.dtype, name='mlp_gamma')(actv)
        beta = nn.Conv(self.norm_nc, (ks, ks), padding=pad, use_bias=False,
                       dtype=self.dtype, name='mlp_beta')(actv)
        return normalized * gamma + beta


class SPADEResnetBlock(nn.Module):
    """(reference hifacegan_util.py:58-114)"""
    fin: int
    fout: int
    norm_g: str = 'spectralspadesyncbatch3x3'
    semantic_nc: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x, seg):
        learned_shortcut = self.fin != self.fout
        fmiddle = min(self.fin, self.fout)
        use_sn = 'spectral' in self.norm_g
        spade_cfg = self.norm_g.replace('spectral', '')

        def make_conv(feats, k, pad, bias, name):
            if use_sn:
                return SNConv2d(feats, k, 1, pad, use_bias=bias, dtype=self.dtype, name=name)
            return nn.Conv(feats, (k, k), padding=pad, use_bias=bias,
                           dtype=self.dtype, name=name)

        act = lambda v: nn.leaky_relu(v, 0.2)  # noqa: E731
        if learned_shortcut:
            x_s = make_conv(self.fout, 1, 0, False, 'conv_s')(
                SPADE(spade_cfg, self.fin, self.semantic_nc, self.dtype, name='norm_s')(x, seg))
        else:
            x_s = x
        dx = make_conv(fmiddle, 3, 1, True, 'conv_0')(
            act(SPADE(spade_cfg, self.fin, self.semantic_nc, self.dtype, name='norm_0')(x, seg)))
        dx = make_conv(self.fout, 3, 1, True, 'conv_1')(
            act(SPADE(spade_cfg, fmiddle, self.semantic_nc, self.dtype, name='norm_1')(dx, seg)))
        return x_s + dx


class SimplifiedLIP(nn.Module):
    """(reference hifacegan_util.py:278-291): conv -> affine instance norm ->
    12*sigmoid gate, feeding lip2d."""
    channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        logit = nn.Conv(self.channels, (3, 3), use_bias=False, dtype=self.dtype,
                        name='logit_0')(x)
        logit = nn.GroupNorm(num_groups=self.channels, name='logit_1')(logit)
        logit = jax.nn.sigmoid(logit) * 12.0  # SoftGate COEFF
        return lip2d(x, logit)


class LIPEncoder(nn.Module):
    """Local-importance-pooling encoder (reference hifacegan_util.py:294-330).
    Module names follow the torch ``nn.Sequential`` indices so checkpoints
    convert key-for-key."""
    input_nc: int
    ngf: int
    sw: int
    sh: int
    n_2xdown: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        max_ratio = 16
        x = nn.Conv(self.ngf, (3, 3), use_bias=False, dtype=self.dtype, name='model_0')(x)
        x = nn.relu(instance_norm(x))
        idx = 3
        cur = 1
        for i in range(self.n_2xdown):
            nxt = min(cur * 2, max_ratio)
            x = SimplifiedLIP(self.ngf * cur, dtype=self.dtype, name=f'model_{idx}')(x)
            x = nn.Conv(self.ngf * nxt, (3, 3), dtype=self.dtype,
                        name=f'model_{idx + 1}')(x)
            x = instance_norm(x)
            cur = nxt
            idx += 4 if i < self.n_2xdown - 1 else 3
            if i < self.n_2xdown - 1:
                x = nn.relu(x)
        return x
