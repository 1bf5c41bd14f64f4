"""Color-space conversions with MATLAB (ITU-R BT.601) coefficients.

Reference: basicsr/utils/color_util.py:5-208. These feed the Y-channel
PSNR/SSIM protocol, so coefficients and rounding must match MATLAB's
``rgb2ycbcr`` exactly. Numpy versions run in float64 host-side; the
``*_jax`` variants run on device for jit-fused metric paths.
"""

from __future__ import annotations

import numpy as np

# MATLAB rgb2ycbcr matrix (input in [0, 1], output in [0, 255] before range
# restore): rows produce Y, Cb, Cr.
_YCBCR_WEIGHTS = np.array([
    [65.481, -37.797, 112.0],
    [128.553, -74.203, -93.786],
    [24.966, 112.0, -18.214],
], dtype=np.float64)  # indexed [rgb_channel, ycbcr_channel]
_YCBCR_BIAS = np.array([16.0, 128.0, 128.0], dtype=np.float64)
_Y_WEIGHTS = _YCBCR_WEIGHTS[:, 0]


def _convert_input_type_range(img: np.ndarray) -> np.ndarray:
    """To float32/64 in [0, 1] (reference color_util.py:129-151)."""
    img_type = img.dtype
    img = img.astype(np.float64)
    if img_type == np.uint8:
        img /= 255.
    elif img_type not in (np.float32, np.float64):
        raise TypeError(f'The img type should be np.float32/64 or np.uint8, but got {img_type}')
    return img


def _convert_output_type_range(img: np.ndarray, dst_type) -> np.ndarray:
    """Back to the caller's dtype convention (reference color_util.py:154-183)."""
    if dst_type not in (np.uint8, np.float32, np.float64):
        raise TypeError(f'The dst_type should be np.float32/64 or np.uint8, but got {dst_type}')
    if dst_type == np.uint8:
        img = img.round()
    else:
        img /= 255.
    return img.astype(dst_type)


def rgb2ycbcr(img: np.ndarray, y_only: bool = False) -> np.ndarray:
    """RGB -> YCbCr, MATLAB convention (reference color_util.py:5-35)."""
    img_type = img.dtype
    img = _convert_input_type_range(img)
    if y_only:
        out = img @ _Y_WEIGHTS + 16.0
    else:
        out = img @ _YCBCR_WEIGHTS + _YCBCR_BIAS
    return _convert_output_type_range(out, img_type.type)


def bgr2ycbcr(img: np.ndarray, y_only: bool = False) -> np.ndarray:
    """BGR -> YCbCr (reference color_util.py:38-68)."""
    return rgb2ycbcr(img[..., ::-1], y_only=y_only)


def ycbcr2rgb(img: np.ndarray) -> np.ndarray:
    """YCbCr -> RGB inverse transform (reference color_util.py:71-99)."""
    img_type = img.dtype
    img = _convert_input_type_range(img) * 255.
    # Forward is ycbcr = rgb01 @ W + B; invert: rgb01 = (ycbcr - B) @ inv(W).
    out = (img - _YCBCR_BIAS) @ np.linalg.inv(_YCBCR_WEIGHTS) * 255.
    return _convert_output_type_range(out, img_type.type)


def ycbcr2bgr(img: np.ndarray) -> np.ndarray:
    return ycbcr2rgb(img)[..., ::-1]


def rgb2ycbcr_jax(img, y_only: bool = False):
    """Device variant on NHWC float tensors in [0, 1]; returns [0, 1] range
    (reference ``rgb2ycbcr_pt``, color_util.py:186-208)."""
    import jax.numpy as jnp
    w = jnp.asarray(_YCBCR_WEIGHTS, dtype=img.dtype)
    b = jnp.asarray(_YCBCR_BIAS, dtype=img.dtype)
    if y_only:
        out = img @ w[:, 0:1] + 16.0
    else:
        out = img @ w + b
    return out / 255.
