"""Differentiable JPEG, pure JAX (reference: basicsr/utils/diffjpeg.py:32-515).

Runs inside the jitted Real-ESRGAN degradation pipeline: RGB->YCbCr (JPEG
matrix), 2x2 chroma subsampling, 8x8 block DCT-II, quantization with the
standard luminance/chrominance tables scaled by a (traceable) quality factor
and a differentiable rounding ``round(x) + (x - round(x))^3``, then the
inverse path. Input NHWC RGB in [0, 1]; height/width padded to multiples of
16 and cropped back.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np

# Standard JPEG quantization tables (JPEG spec / libjpeg). NOTE: stored
# transposed, matching the upstream DiffJPEG convention the reference
# inherits (diffjpeg.py:14-19 applies .T) — required for numeric parity.
Y_TABLE = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.float32).T

C_TABLE = np.full((8, 8), 99, dtype=np.float32)
C_TABLE[:4, :4] = np.array([[17, 18, 24, 47], [18, 21, 26, 66], [24, 26, 56, 99],
                            [47, 66, 99, 99]], dtype=np.float32)

# DCT-II basis tensor: dct[x, y, u, v] = cos((2x+1)u pi/16) cos((2y+1)v pi/16)
_DCT = np.zeros((8, 8, 8, 8), dtype=np.float32)
for x, y, u, v in itertools.product(range(8), repeat=4):
    _DCT[x, y, u, v] = np.cos((2 * x + 1) * u * np.pi / 16) * np.cos((2 * y + 1) * v * np.pi / 16)
_ALPHA = np.array([1. / np.sqrt(2)] + [1.] * 7, dtype=np.float32)
_DCT_SCALE = np.outer(_ALPHA, _ALPHA) * 0.25
# inverse basis
_IDCT = np.zeros((8, 8, 8, 8), dtype=np.float32)
_alpha_outer = np.outer(_ALPHA, _ALPHA)
for x, y, u, v in itertools.product(range(8), repeat=4):
    _IDCT[u, v, x, y] = np.cos((2 * x + 1) * u * np.pi / 16) * np.cos((2 * y + 1) * v * np.pi / 16)

_RGB2YCBCR = np.array([[0.299, 0.587, 0.114],
                       [-0.168736, -0.331264, 0.5],
                       [0.5, -0.418688, -0.081312]], dtype=np.float32).T
_YCBCR_SHIFT = np.array([0., 128., 128.], dtype=np.float32)
_YCBCR2RGB = np.array([[1., 0., 1.402],
                       [1., -0.344136, -0.714136],
                       [1., 1.772, 0.]], dtype=np.float32).T


def diff_round(x: jnp.ndarray) -> jnp.ndarray:
    """Differentiable rounding (reference diffjpeg.py:23-29)."""
    return jnp.round(x) + jnp.power(x - jnp.round(x), 3)


def quality_to_factor(quality):
    """JPEG quality (1..100) -> table scale factor (reference diffjpeg.py:32-44).
    Accepts traced arrays."""
    quality = jnp.asarray(quality, jnp.float32)
    return jnp.where(quality < 50, 5000. / quality, 200. - quality * 2) / 100.


def _to_blocks(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W) -> (N, nb, 8, 8)."""
    n, h, w = x.shape
    x = x.reshape(n, h // 8, 8, w // 8, 8)
    return x.transpose(0, 1, 3, 2, 4).reshape(n, -1, 8, 8)


def _from_blocks(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    n = x.shape[0]
    x = x.reshape(n, h // 8, w // 8, 8, 8)
    return x.transpose(0, 1, 3, 2, 4).reshape(n, h, w)


def _dct8x8(blocks: jnp.ndarray) -> jnp.ndarray:
    """(..., 8, 8) spatial -> frequency (reference DCT8x8, diffjpeg.py:121)."""
    blocks = blocks - 128.
    out = jnp.tensordot(blocks, jnp.asarray(_DCT), axes=([-2, -1], [0, 1]))
    return out * jnp.asarray(_DCT_SCALE)


def _idct8x8(blocks: jnp.ndarray) -> jnp.ndarray:
    """frequency -> spatial (reference iDCT8x8)."""
    blocks = blocks * jnp.asarray(_alpha_outer)
    out = 0.25 * jnp.tensordot(blocks, jnp.asarray(_IDCT), axes=([-2, -1], [0, 1])) + 128.
    return out


class DiffJPEG:
    """Differentiable JPEG round-trip (reference diffjpeg.py:449-515).

    Call with NHWC RGB in [0, 1] and per-sample ``quality`` (scalar or (N,));
    rounding uses diff_round when ``differentiable`` (default)."""

    def __init__(self, differentiable: bool = True):
        self.rounding = diff_round if differentiable else jnp.round

    def __call__(self, x: jnp.ndarray, quality) -> jnp.ndarray:
        n, h, w, _ = x.shape
        factor = quality_to_factor(quality)
        if factor.ndim == 0:
            factor = jnp.full((n,), factor)
        factor = factor.reshape(n, 1, 1, 1)

        # pad to multiples of 16 (reference diffjpeg.py:470-478)
        h_pad = (16 - h % 16) % 16
        w_pad = (16 - w % 16) % 16
        x = jnp.pad(x, ((0, 0), (0, h_pad), (0, w_pad), (0, 0)))
        hp, wp = h + h_pad, w + w_pad

        img = x.astype(jnp.float32) * 255.
        ycbcr = img @ jnp.asarray(_RGB2YCBCR) + jnp.asarray(_YCBCR_SHIFT)
        y, cb, cr = ycbcr[..., 0], ycbcr[..., 1], ycbcr[..., 2]

        # chroma 2x2 average subsampling (reference diffjpeg.py:77-99)
        def sub(c):
            return c.reshape(n, hp // 2, 2, wp // 2, 2).mean(axis=(2, 4))

        cb_s, cr_s = sub(cb), sub(cr)

        y_t = jnp.asarray(Y_TABLE)
        c_t = jnp.asarray(C_TABLE)

        def compress(comp, table):
            blocks = _dct8x8(_to_blocks(comp))
            return self.rounding(blocks / (table * factor))

        def decompress(codes, table, hh, ww):
            blocks = codes * (table * factor)
            return _from_blocks(_idct8x8(blocks), hh, ww)

        y_q = compress(y, y_t)
        cb_q = compress(cb_s, c_t)
        cr_q = compress(cr_s, c_t)

        y_r = decompress(y_q, y_t, hp, wp)
        cb_r = decompress(cb_q, c_t, hp // 2, wp // 2)
        cr_r = decompress(cr_q, c_t, hp // 2, wp // 2)

        # chroma upsampling: nearest repeat (reference diffjpeg.py:316-338)
        def up(c):
            return jnp.repeat(jnp.repeat(c, 2, axis=1), 2, axis=2)

        ycbcr_r = jnp.stack([y_r, up(cb_r), up(cr_r)], axis=-1)
        rgb = (ycbcr_r - jnp.asarray(_YCBCR_SHIFT)) @ jnp.asarray(_YCBCR2RGB)
        rgb = jnp.clip(rgb, 0, 255) / 255.
        return rgb[:, :h, :w, :]


def add_jpg_compression(img: np.ndarray, quality: int = 90) -> np.ndarray:
    """Host-side real JPEG compression via cv2 (reference
    data/degradations.py:731-748). HWC [0,1] float."""
    import cv2
    encode_param = [int(cv2.IMWRITE_JPEG_QUALITY), int(quality)]
    _, encimg = cv2.imencode('.jpg', (img * 255.).clip(0, 255).astype(np.uint8), encode_param)
    return np.float32(cv2.imdecode(encimg, 1)) / 255.
