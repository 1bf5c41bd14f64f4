"""MATLAB-parity bicubic resize.

Re-derivation of MATLAB's ``imresize`` (bicubic, antialiasing on downscale),
the ground-truth LR generator for the SR benchmarks (reference:
basicsr/utils/matlab_functions.py:6-178 implements the same algorithm in
torch). We implement it in float64 numpy — it runs host-side during data prep
and metric evaluation, so there is no reason to put it on the TPU.

Algorithm (standard, as published in MATLAB's documentation and the widely
reproduced ports): for each output coordinate, map to input space with
``u = x/scale + 0.5*(1 - 1/scale)``, take a window of ``ceil(kw) + 2`` taps
around it, weight with the Keys cubic kernel (a = -0.5) — stretched by the
scale factor when antialiasing a downscale — normalize weights to sum 1, and
mirror out-of-range indices at the borders. Applied separably to H then W.
"""

from __future__ import annotations

from typing import Tuple, Union

import numpy as np


def cubic(x: np.ndarray) -> np.ndarray:
    """Keys bicubic convolution kernel with a = -0.5 (MATLAB's default)."""
    absx = np.abs(x)
    absx2 = absx * absx
    absx3 = absx2 * absx
    inner = (1.5 * absx3 - 2.5 * absx2 + 1.0) * (absx <= 1)
    outer = (-0.5 * absx3 + 2.5 * absx2 - 4.0 * absx + 2.0) * ((absx > 1) & (absx <= 2))
    return inner + outer


def calculate_weights_indices(in_length: int,
                              out_length: int,
                              scale: float,
                              kernel_width: float = 4.0,
                              antialiasing: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """Precompute (weights, indices) for one resize axis.

    Returns ``weights`` of shape (out_length, P) and integer ``indices`` of
    the same shape, with border indices mirrored into range and all-zero
    weight columns trimmed.
    """
    if (scale < 1) and antialiasing:
        # Stretch the kernel to act as a low-pass filter when shrinking.
        kernel_width = kernel_width / scale

    x = np.arange(1, out_length + 1, dtype=np.float64)
    # Map output coords to input space (1-based, MATLAB convention).
    u = x / scale + 0.5 * (1 - 1 / scale)
    left = np.floor(u - kernel_width / 2)
    p = int(np.ceil(kernel_width)) + 2

    indices = left[:, None] + np.arange(p, dtype=np.float64)[None, :]
    dist = u[:, None] - indices
    if (scale < 1) and antialiasing:
        weights = scale * cubic(dist * scale)
    else:
        weights = cubic(dist)
    weights = weights / np.sum(weights, axis=1, keepdims=True)

    # Trim leading/trailing all-zero weight columns.
    nz = np.nonzero(np.any(np.abs(weights) > 1e-12, axis=0))[0]
    first, last = nz[0], nz[-1]
    weights = weights[:, first:last + 1]
    indices = indices[:, first:last + 1]

    # Mirror out-of-range indices (MATLAB 'symmetric' boundary).
    aux = np.concatenate([np.arange(in_length), np.arange(in_length)[::-1]])
    indices = aux[np.mod(indices.astype(np.int64) - 1, 2 * in_length)]
    return weights, indices


def imresize(img: np.ndarray,
             scale: float,
             antialiasing: bool = True) -> np.ndarray:
    """MATLAB-identical bicubic resize of an HWC (or HW) image.

    Args:
        img: float array, any range (typically [0, 1]); HW or HWC.
        scale: output = round(input * scale) per spatial dim.
        antialiasing: stretch the kernel on downscale (MATLAB default True).

    Returns:
        Resized float64 array with the same channel layout.
    """
    squeeze = False
    if img.ndim == 2:
        img = img[:, :, None]
        squeeze = True
    in_h, in_w, c = img.shape
    # MATLAB output size convention: ceil(in * scale).
    out_h = int(np.ceil(in_h * scale))
    out_w = int(np.ceil(in_w * scale))

    img = img.astype(np.float64)

    weights_h, indices_h = calculate_weights_indices(in_h, out_h, scale, 4.0, antialiasing)
    weights_w, indices_w = calculate_weights_indices(in_w, out_w, scale, 4.0, antialiasing)

    # Resize along H: gather rows then weighted-sum.
    # img[indices_h] -> (out_h, P, in_w, c); einsum over P.
    tmp = np.einsum('op,opwc->owc', weights_h, img[indices_h])
    # Resize along W.
    out = np.einsum('op,hopc->hoc', weights_w, tmp[:, indices_w])

    if squeeze:
        out = out[:, :, 0]
    return out


def imresize_uint8(img: np.ndarray, scale: float, antialiasing: bool = True) -> np.ndarray:
    """Convenience: uint8 in, uint8 out (round + clip like MATLAB)."""
    out = imresize(img.astype(np.float64) / 255.0, scale, antialiasing)
    return np.clip(np.round(out * 255.0), 0, 255).astype(np.uint8)
