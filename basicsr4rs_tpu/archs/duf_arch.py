"""DUF — dynamic upsampling filters video SR
(reference: basicsr/archs/duf_arch.py:9-276). Frames (B, T, H, W, C); 3D
convs run natively as NDHWC with D = time.

Conversion note: conv weights map directly; BatchNorm running stats are in a
separate collection (load with ``strict_load_g: false`` when converting
reference checkpoints — scale/bias convert, running stats re-estimate).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..utils.registry import ARCH_REGISTRY
from .arch_util import pixel_shuffle


def _bn(name, train, eps):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=eps, name=name)


def _conv3d(name, features, ksize, padding):
    return nn.Conv(features, ksize, padding=padding, name=name)


class DenseBlocks(nn.Module):
    """(reference duf_arch.py:82-135). x: (B, T, H, W, C)."""
    num_block: int
    num_feat: int = 64
    num_grow_ch: int = 16
    eps: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_block):
            y = _bn(f'dense_blocks_{i}_0', train, self.eps)(x)
            y = nn.relu(y)
            y = _conv3d(f'dense_blocks_{i}_2', x.shape[-1], (1, 1, 1), 'VALID')(y)
            y = _bn(f'dense_blocks_{i}_3', train, self.eps)(y)
            y = nn.relu(y)
            y = _conv3d(f'dense_blocks_{i}_5', self.num_grow_ch, (3, 3, 3),
                        ((1, 1), (1, 1), (1, 1)))(y)
            x = jnp.concatenate([x, y], axis=-1)
        return x


class DenseBlocksTemporalReduce(nn.Module):
    """3 dense blocks, each shrinking T by 2 (reference duf_arch.py:9-79)."""
    num_feat: int = 64
    num_grow_ch: int = 32
    eps: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in (1, 2, 3):
            y = _bn(f'temporal_reduce{i}_0', train, self.eps)(x)
            y = nn.relu(y)
            y = _conv3d(f'temporal_reduce{i}_2', x.shape[-1], (1, 1, 1), 'VALID')(y)
            y = _bn(f'temporal_reduce{i}_3', train, self.eps)(y)
            y = nn.relu(y)
            # (3,3,3) conv valid in T, same in H/W
            y = _conv3d(f'temporal_reduce{i}_5', self.num_grow_ch, (3, 3, 3),
                        ((0, 0), (1, 1), (1, 1)))(y)
            x = jnp.concatenate([x[:, 1:-1], y], axis=-1)
        return x


def dynamic_upsampling_filter(x: jnp.ndarray, filters: jnp.ndarray,
                              filter_size: Tuple[int, int] = (5, 5)) -> jnp.ndarray:
    """Apply per-pixel dynamic filters (reference duf_arch.py:138-180).

    Args:
        x: center frame (N, H, W, 3).
        filters: (N, H, W, filter_prod, upsampling_square), softmaxed.
    Returns: (N, H, W, 3*upsampling_square) in torch channel order
        (c * us + u) after the matmul + permute of the reference.
    """
    kh, kw = filter_size
    n, h, w, c = x.shape
    patches = jax.lax.conv_general_dilated_patches(
        x, (kh, kw), (1, 1), ((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    # patches channels ordered (c, kh*kw) — matches torch's grouped expansion
    patches = patches.reshape(n, h, w, c, kh * kw)
    out = jnp.einsum('nhwck,nhwku->nhwcu', patches, filters)
    return out.reshape(n, h, w, c * filters.shape[-1])


@ARCH_REGISTRY.register()
class DUF(nn.Module):
    """(reference duf_arch.py:182-276)"""
    # BatchNorm3d positions in the reference Sequentials -> flax 'scale'
    TORCH_KEY_RULES = (
        (r'(dense_blocks\.\d+|temporal_reduce\d)\.(0|3)\.weight', r'\1.\2.scale'),
        (r'^bn3d2\.weight', 'bn3d2.scale'),
    )

    scale: int = 4
    num_layer: int = 52
    adapt_official_weights: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        eps = 1e-3 if self.adapt_official_weights else 1e-5
        b, t, h, w, c = x.shape
        x_center = x[:, t // 2]

        if self.num_layer == 16:
            num_block, num_grow_ch = 3, 32
        elif self.num_layer == 28:
            num_block, num_grow_ch = 9, 16
        elif self.num_layer == 52:
            num_block, num_grow_ch = 21, 16
        else:
            raise ValueError(f'Only supported (16, 28, 52) layers, but got {self.num_layer}.')

        feat = _conv3d('conv3d1', 64, (1, 3, 3), ((0, 0), (1, 1), (1, 1)))(x)
        feat = DenseBlocks(num_block, 64, num_grow_ch, eps, name='dense_block1')(feat, train)
        feat = DenseBlocksTemporalReduce(64 + num_grow_ch * num_block, num_grow_ch, eps,
                                         name='dense_block2')(feat, train)
        feat = nn.relu(_bn('bn3d2', train, eps)(feat))
        feat = nn.relu(_conv3d('conv3d2', 256, (1, 3, 3), ((0, 0), (1, 1), (1, 1)))(feat))

        res = _conv3d('conv3d_r2', 3 * self.scale**2, (1, 1, 1), 'VALID')(
            nn.relu(_conv3d('conv3d_r1', 256, (1, 1, 1), 'VALID')(feat)))

        filt = _conv3d('conv3d_f2', 25 * self.scale**2, (1, 1, 1), 'VALID')(
            nn.relu(_conv3d('conv3d_f1', 512, (1, 1, 1), 'VALID')(feat)))
        # (B, 1, H, W, 25*us) -> softmax over the 25 taps
        filt = filt[:, 0].reshape(b, h, w, 25, self.scale**2)
        filt = jax.nn.softmax(filt, axis=3)

        out = dynamic_upsampling_filter(x_center, filt, (5, 5))
        out = out + res[:, 0]
        return pixel_shuffle(out, self.scale)
