"""InceptionV3 feature extractor for FID (reference:
basicsr/archs/inception.py:17-307, itself the pytorch-fid port of the
TF inception-2015-12-05 network).

Inference-only flax implementation of the *FID variant* (the pool quirks:
``count_include_pad=False`` average pools in the A/C/E blocks and a max pool
in Mixed_7c). BatchNorm statistics are plain parameters (``mean``/``var``) —
there is no training path, so nothing needs a mutable collection. Module and
parameter names mirror the torch checkpoint keys, so
``pt_inception-2015-12-05-*.pth`` converts directly via ``TORCH_KEY_RULES``.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils.registry import ARCH_REGISTRY

# torch FID weights (download offline and convert via load_torch_checkpoint)
FID_WEIGHTS_URL = ('https://github.com/mseitzer/pytorch-fid/releases/download/'
                   'fid_weights/pt_inception-2015-12-05-6726825d.pth')
LOCAL_FID_WEIGHTS = 'experiments/pretrained_models/pt_inception-2015-12-05-6726825d.pth'


def _avg_pool_3x3s1_nopad(x):
    """torch ``F.avg_pool2d(x, 3, 1, 1, count_include_pad=False)``."""
    summed = jax.lax.reduce_window(x, 0., jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                                   [(0, 0), (1, 1), (1, 1), (0, 0)])
    ones = jnp.ones((1,) + x.shape[1:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(ones, 0., jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                                   [(0, 0), (1, 1), (1, 1), (0, 0)])
    return summed / counts


def _max_pool(x, k=3, s=2, p=0):
    pads = [(0, 0), (p, p), (p, p), (0, 0)]
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), pads)


class BasicConv2d(nn.Module):
    """conv (no bias) + frozen BN (eps 1e-3), like torchvision's BasicConv2d."""
    out_channels: int
    kernel_size: tuple = (3, 3)
    stride: int = 1
    padding: Any = 0
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        elif isinstance(pad, tuple) and isinstance(pad[0], int):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        kernel = self.param('conv_kernel', nn.initializers.lecun_normal(),
                            (kh, kw, x.shape[-1], self.out_channels))
        out = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (self.stride, self.stride), list(pad),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        c = self.out_channels
        scale = self.param('bn_scale', nn.initializers.ones, (c,))
        bias = self.param('bn_bias', nn.initializers.zeros, (c,))
        mean = self.param('bn_mean', nn.initializers.zeros, (c,))
        var = self.param('bn_var', nn.initializers.ones, (c,))
        out = (out - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        return nn.relu(out)


class _InceptionA(nn.Module):
    pool_features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b1 = BasicConv2d(64, (1, 1), dtype=d, name='branch1x1')(x)
        b5 = BasicConv2d(48, (1, 1), dtype=d, name='branch5x5_1')(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, dtype=d, name='branch5x5_2')(b5)
        b3 = BasicConv2d(64, (1, 1), dtype=d, name='branch3x3dbl_1')(x)
        b3 = BasicConv2d(96, (3, 3), padding=1, dtype=d, name='branch3x3dbl_2')(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, dtype=d, name='branch3x3dbl_3')(b3)
        bp = _avg_pool_3x3s1_nopad(x)
        bp = BasicConv2d(self.pool_features, (1, 1), dtype=d, name='branch_pool')(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class _InceptionB(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b3 = BasicConv2d(384, (3, 3), stride=2, dtype=d, name='branch3x3')(x)
        bd = BasicConv2d(64, (1, 1), dtype=d, name='branch3x3dbl_1')(x)
        bd = BasicConv2d(96, (3, 3), padding=1, dtype=d, name='branch3x3dbl_2')(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, dtype=d, name='branch3x3dbl_3')(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class _InceptionC(nn.Module):
    channels_7x7: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        d, c7 = self.dtype, self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), dtype=d, name='branch1x1')(x)
        b7 = BasicConv2d(c7, (1, 1), dtype=d, name='branch7x7_1')(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=d, name='branch7x7_2')(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=d, name='branch7x7_3')(b7)
        bd = BasicConv2d(c7, (1, 1), dtype=d, name='branch7x7dbl_1')(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=d, name='branch7x7dbl_2')(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=d, name='branch7x7dbl_3')(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=d, name='branch7x7dbl_4')(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=d, name='branch7x7dbl_5')(bd)
        bp = _avg_pool_3x3s1_nopad(x)
        bp = BasicConv2d(192, (1, 1), dtype=d, name='branch_pool')(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class _InceptionD(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b3 = BasicConv2d(192, (1, 1), dtype=d, name='branch3x3_1')(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, dtype=d, name='branch3x3_2')(b3)
        b7 = BasicConv2d(192, (1, 1), dtype=d, name='branch7x7x3_1')(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=d, name='branch7x7x3_2')(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=d, name='branch7x7x3_3')(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, dtype=d, name='branch7x7x3_4')(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class _InceptionE(nn.Module):
    pool_mode: str = 'avg'  # Mixed_7b: FID avg (no pad count); Mixed_7c: max
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b1 = BasicConv2d(320, (1, 1), dtype=d, name='branch1x1')(x)
        b3 = BasicConv2d(384, (1, 1), dtype=d, name='branch3x3_1')(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), dtype=d, name='branch3x3_2a')(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), dtype=d, name='branch3x3_2b')(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), dtype=d, name='branch3x3dbl_1')(x)
        bd = BasicConv2d(384, (3, 3), padding=1, dtype=d, name='branch3x3dbl_2')(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), dtype=d, name='branch3x3dbl_3a')(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), dtype=d, name='branch3x3dbl_3b')(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_mode == 'avg':
            bp = _avg_pool_3x3s1_nopad(x)
        else:
            bp = _max_pool(x, 3, 1, 1)
        bp = BasicConv2d(192, (1, 1), dtype=d, name='branch_pool')(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


@ARCH_REGISTRY.register()
class InceptionV3(nn.Module):
    """FID InceptionV3 returning the selected block outputs
    (reference inception.py:17-155). Input NHWC in [0, 1] when
    ``normalize_input`` else [-1, 1]."""
    output_blocks: Sequence[int] = (3,)
    resize_input: bool = True
    normalize_input: bool = True
    dtype: Any = None

    TORCH_KEY_RULES = (
        (r'\.conv\.weight$', '.conv_kernel'),
        (r'\.bn\.weight$', '.bn_scale'),
        (r'\.bn\.bias$', '.bn_bias'),
        (r'\.bn\.running_mean$', '.bn_mean'),
        (r'\.bn\.running_var$', '.bn_var'),
    )

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        last = max(self.output_blocks)
        outputs = []
        if self.resize_input:
            x = jax.image.resize(x, (x.shape[0], 299, 299, x.shape[-1]),
                                 method='bilinear', antialias=False)
        if self.normalize_input:
            x = 2 * x - 1

        # block 0
        x = BasicConv2d(32, (3, 3), stride=2, dtype=d, name='Conv2d_1a_3x3')(x)
        x = BasicConv2d(32, (3, 3), dtype=d, name='Conv2d_2a_3x3')(x)
        x = BasicConv2d(64, (3, 3), padding=1, dtype=d, name='Conv2d_2b_3x3')(x)
        x = _max_pool(x, 3, 2)
        if 0 in self.output_blocks:
            outputs.append(x)
        if last == 0:
            return outputs

        # block 1
        x = BasicConv2d(80, (1, 1), dtype=d, name='Conv2d_3b_1x1')(x)
        x = BasicConv2d(192, (3, 3), dtype=d, name='Conv2d_4a_3x3')(x)
        x = _max_pool(x, 3, 2)
        if 1 in self.output_blocks:
            outputs.append(x)
        if last == 1:
            return outputs

        # block 2
        x = _InceptionA(32, dtype=d, name='Mixed_5b')(x)
        x = _InceptionA(64, dtype=d, name='Mixed_5c')(x)
        x = _InceptionA(64, dtype=d, name='Mixed_5d')(x)
        x = _InceptionB(dtype=d, name='Mixed_6a')(x)
        x = _InceptionC(128, dtype=d, name='Mixed_6b')(x)
        x = _InceptionC(160, dtype=d, name='Mixed_6c')(x)
        x = _InceptionC(160, dtype=d, name='Mixed_6d')(x)
        x = _InceptionC(192, dtype=d, name='Mixed_6e')(x)
        if 2 in self.output_blocks:
            outputs.append(x)
        if last == 2:
            return outputs

        # block 3
        x = _InceptionD(dtype=d, name='Mixed_7a')(x)
        x = _InceptionE('avg', dtype=d, name='Mixed_7b')(x)
        x = _InceptionE('max', dtype=d, name='Mixed_7c')(x)
        x = jnp.mean(x, axis=(1, 2), keepdims=True)  # adaptive avg pool (1,1)
        if 3 in self.output_blocks:
            outputs.append(x)
        return outputs
