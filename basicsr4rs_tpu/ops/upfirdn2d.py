"""upfirdn2d — upsample, FIR filter, downsample.

Replaces the reference CUDA kernel (reference: basicsr/ops/upfirdn2d/
upfirdn2d_kernel.cu, 370 LoC; pure-torch spec at ops/upfirdn2d/
upfirdn2d.py:162-196). On TPU this is exactly one
``lax.conv_general_dilated``: lhs_dilation performs the zero-stuffing
upsample, padding the asymmetric pad, window_strides the downsample, and the
flipped kernel makes it a true convolution like the reference. XLA fuses it;
no hand-written kernel needed. NHWC, depthwise over channels.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


def make_resample_kernel(k: Sequence[float]) -> jnp.ndarray:
    """1D magnitudes -> normalized 2D kernel (reference stylegan2_arch.py:26-40)."""
    k = jnp.asarray(k, jnp.float32)
    if k.ndim == 1:
        k = k[None, :] * k[:, None]
    return k / jnp.sum(k)


def upfirdn2d(x: jnp.ndarray,
              kernel: jnp.ndarray,
              up: int = 1,
              down: int = 1,
              pad: Union[Tuple[int, int], Tuple[int, int, int, int]] = (0, 0)) -> jnp.ndarray:
    """NHWC upfirdn2d with the reference's semantics.

    pad is (pad0, pad1) applied to both axes, or (x0, x1, y0, y1).
    """
    if len(pad) == 2:
        pad_x0, pad_x1 = pad_y0, pad_y1 = pad
    else:
        pad_x0, pad_x1, pad_y0, pad_y1 = pad
    n, h, w, c = x.shape
    kh, kw = kernel.shape

    kern = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    kern = jnp.tile(kern[:, :, None, None], (1, 1, 1, c))  # HWIO depthwise

    # XLA lhs_dilation yields (n-1)*up+1 samples; torch's upfirdn zero-stuffs
    # to n*up — fold the missing trailing zeros into the end padding.
    # Negative pads (crops) are accepted by XLA directly.
    out = jax.lax.conv_general_dilated(
        x, kern,
        window_strides=(down, down),
        padding=((pad_y0, pad_y1 + up - 1), (pad_x0, pad_x1 + up - 1)),
        lhs_dilation=(up, up),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=c)
    return out


def upfirdn_upsample(x, kernel, factor: int = 2):
    """(reference stylegan2_arch.py:43-70)"""
    kernel = kernel * (factor ** 2)
    p = kernel.shape[0] - factor
    pad = ((p + 1) // 2 + factor - 1, p // 2)
    return upfirdn2d(x, kernel, up=factor, down=1, pad=pad)


def upfirdn_downsample(x, kernel, factor: int = 2):
    """(reference stylegan2_arch.py:72-95)"""
    p = kernel.shape[0] - factor
    pad = ((p + 1) // 2, p // 2)
    return upfirdn2d(x, kernel, up=1, down=factor, pad=pad)


def upfirdn_smooth(x, kernel, upsample_factor: int = 1, downsample_factor: int = 1,
                   kernel_size: int = 1):
    """Smoothing FIR around a strided (de)conv (reference
    stylegan2_arch.py:97-131; kernel pre-scaled by up^2 there)."""
    if upsample_factor > 1:
        kernel = kernel * (upsample_factor ** 2)
        p = (kernel.shape[0] - upsample_factor) - (kernel_size - 1)
        pad = ((p + 1) // 2 + upsample_factor - 1, p // 2 + 1)
    elif downsample_factor > 1:
        p = (kernel.shape[0] - downsample_factor) + (kernel_size - 1)
        pad = ((p + 1) // 2, p // 2)
    else:
        raise NotImplementedError
    return upfirdn2d(x, kernel, up=1, down=1, pad=pad)
