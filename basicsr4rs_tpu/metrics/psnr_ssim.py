"""PSNR / SSIM with the reference's exact numeric conventions.

Reference: basicsr/metrics/psnr_ssim.py:12-309. Protocol (docs/ModelZoo.md:48):
images in the [0, 255] range (uint8 or float), ``crop_border`` pixels removed
per edge, optional Y-channel evaluation using MATLAB ycbcr coefficients,
float64 math. SSIM: 11x11 Gaussian window (sigma 1.5), C1=(0.01*255)^2,
C2=(0.03*255)^2, valid-region convolution, averaged over channels.

``*_jax`` variants run the same math on device (NHWC batches) for use inside
jitted validation loops; host numpy versions remain the parity ground truth.
Per-band RS variants (reference :92, :210) evaluate a single spectral band.
"""

from __future__ import annotations

import cv2
import numpy as np

from ..utils.color_util import bgr2ycbcr, rgb2ycbcr_jax
from ..utils.registry import METRIC_REGISTRY


def reorder_image(img: np.ndarray, input_order: str = 'HWC') -> np.ndarray:
    """Accept HWC or CHW inputs, return HWC (reference psnr_ssim.py helper)."""
    if input_order not in ('HWC', 'CHW'):
        raise ValueError(f"Wrong input_order {input_order}. Supported: 'HWC' and 'CHW'")
    if img.ndim == 2:
        return img[..., None]
    if input_order == 'CHW':
        return img.transpose(1, 2, 0)
    return img


def to_y_channel(img: np.ndarray) -> np.ndarray:
    """[0,255] BGR -> [0,255] Y (MATLAB coefficients), float64."""
    img = img.astype(np.float32) / 255.
    if img.ndim == 3 and img.shape[2] == 3:
        img = bgr2ycbcr(img, y_only=True)
        img = img[..., None]
    return img * 255.


@METRIC_REGISTRY.register()
def calculate_psnr(img: np.ndarray,
                   img2: np.ndarray,
                   crop_border: int,
                   input_order: str = 'HWC',
                   test_y_channel: bool = False,
                   **kwargs) -> float:
    """PSNR in dB on [0, 255]-range images (reference psnr_ssim.py:12-48)."""
    assert img.shape == img2.shape, f'Image shapes are different: {img.shape}, {img2.shape}.'
    img = reorder_image(img, input_order=input_order)
    img2 = reorder_image(img2, input_order=input_order)

    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border, ...]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border, ...]

    if test_y_channel:
        img = to_y_channel(img)
        img2 = to_y_channel(img2)

    img = img.astype(np.float64)
    img2 = img2.astype(np.float64)
    mse = np.mean((img - img2)**2)
    if mse == 0:
        return float('inf')
    return 10. * np.log10(255. * 255. / mse)


@METRIC_REGISTRY.register()
def calculate_psnr_band(img, img2, crop_border, band: int = 0, input_order='HWC', **kwargs) -> float:
    """Single-band PSNR (RS multispectral convention, reference :92)."""
    img = reorder_image(np.asarray(img), input_order=input_order)
    img2 = reorder_image(np.asarray(img2), input_order=input_order)
    return calculate_psnr(img[..., band:band + 1], img2[..., band:band + 1], crop_border)


def _ssim(img: np.ndarray, img2: np.ndarray) -> float:
    """Single-channel SSIM over the valid window region
    (reference psnr_ssim.py:248-276)."""
    c1 = (0.01 * 255)**2
    c2 = (0.03 * 255)**2
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.transpose())

    mu1 = cv2.filter2D(img, -1, window)[5:-5, 5:-5]
    mu2 = cv2.filter2D(img2, -1, window)[5:-5, 5:-5]
    mu1_sq = mu1**2
    mu2_sq = mu2**2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = cv2.filter2D(img**2, -1, window)[5:-5, 5:-5] - mu1_sq
    sigma2_sq = cv2.filter2D(img2**2, -1, window)[5:-5, 5:-5] - mu2_sq
    sigma12 = cv2.filter2D(img * img2, -1, window)[5:-5, 5:-5] - mu1_mu2

    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return float(ssim_map.mean())


@METRIC_REGISTRY.register()
def calculate_ssim(img: np.ndarray,
                   img2: np.ndarray,
                   crop_border: int,
                   input_order: str = 'HWC',
                   test_y_channel: bool = False,
                   **kwargs) -> float:
    """SSIM on [0, 255]-range images (reference psnr_ssim.py:125-169)."""
    assert img.shape == img2.shape, f'Image shapes are different: {img.shape}, {img2.shape}.'
    img = reorder_image(img, input_order=input_order)
    img2 = reorder_image(img2, input_order=input_order)

    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border, ...]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border, ...]

    if test_y_channel:
        img = to_y_channel(img)
        img2 = to_y_channel(img2)

    img = img.astype(np.float64)
    img2 = img2.astype(np.float64)

    ssims = []
    for i in range(img.shape[2]):
        ssims.append(_ssim(img[..., i], img2[..., i]))
    return float(np.array(ssims).mean())


@METRIC_REGISTRY.register()
def calculate_ssim_band(img, img2, crop_border, band: int = 0, input_order='HWC', **kwargs) -> float:
    """Single-band SSIM (RS convention, reference :210)."""
    img = reorder_image(np.asarray(img), input_order=input_order)
    img2 = reorder_image(np.asarray(img2), input_order=input_order)
    return calculate_ssim(img[..., band:band + 1], img2[..., band:band + 1], crop_border)


# ---------------------------------------------------------------------------
# Device (JAX) variants — same math, NHWC float batches in [0, 1].
# Reference `_pt` variants (psnr_ssim.py:51-90, 172-245) are the analog.
# ---------------------------------------------------------------------------

def _gaussian_window_jax(dtype):
    import jax.numpy as jnp
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.transpose())
    return jnp.asarray(window, dtype=dtype)


def calculate_psnr_jax(img, img2, crop_border: int, test_y_channel: bool = False):
    """Batched PSNR on NHWC [0,1] arrays; returns per-sample dB values."""
    import jax.numpy as jnp
    if crop_border != 0:
        img = img[:, crop_border:-crop_border, crop_border:-crop_border, :]
        img2 = img2[:, crop_border:-crop_border, crop_border:-crop_border, :]
    if test_y_channel:
        img = rgb2ycbcr_jax(img, y_only=True)
        img2 = rgb2ycbcr_jax(img2, y_only=True)
    # [0,1] formulation: PSNR = 10 log10(1 / mse) — identical to the
    # [0,255] form and float32-safe.
    img = img.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    mse = jnp.mean((img - img2)**2, axis=(1, 2, 3))
    return -10. * jnp.log10(mse)


def _to_nhwc01(img):
    """Coerce a metric input to an NHWC [0,1] **RGB** device array: accepts
    device NHWC floats (validation outputs, RGB), HWC numpy uint8
    (``tensor2img`` results — BGR by that function's default, flipped to RGB
    here and rescaled /255), or HWC float (assumed RGB [0,1], the tensor
    convention of the reference ``_pt`` variants). The channel flip only
    matters for ``test_y_channel`` (PSNR/SSIM are channel-permutation
    invariant otherwise) but keeps ``rgb2ycbcr_jax`` correct for both input
    kinds."""
    import jax.numpy as jnp
    arr = jnp.asarray(img)
    is_uint8 = arr.dtype == jnp.uint8
    scale = 1. / 255. if is_uint8 else 1.
    arr = arr.astype(jnp.float32) * scale
    if arr.ndim == 2:
        arr = arr[..., None]
    if arr.ndim == 3:
        arr = arr[None]
    if is_uint8 and arr.shape[-1] == 3:
        arr = arr[..., ::-1]  # tensor2img emits BGR (img_util.py rgb2bgr=True)
    return arr


@METRIC_REGISTRY.register()
def calculate_psnr_pt(img, img2, crop_border: int, test_y_channel: bool = False,
                      **kwargs) -> float:
    """Tensor-input PSNR (reference psnr_ssim.py:51-90): device math on
    NHWC [0,1] batches, returns the batch-mean dB as a float. Registered so
    reference configs naming ``calculate_psnr_pt`` build unchanged."""
    import jax.numpy as jnp
    val = calculate_psnr_jax(_to_nhwc01(img), _to_nhwc01(img2), crop_border,
                             test_y_channel)
    return float(jnp.mean(val))


@METRIC_REGISTRY.register()
def calculate_ssim_pt(img, img2, crop_border: int, test_y_channel: bool = False,
                      **kwargs) -> float:
    """Tensor-input SSIM (reference psnr_ssim.py:172-245); see
    :func:`calculate_psnr_pt`."""
    import jax.numpy as jnp
    val = calculate_ssim_jax(_to_nhwc01(img), _to_nhwc01(img2), crop_border,
                             test_y_channel)
    return float(jnp.mean(val))


def calculate_ssim_jax(img, img2, crop_border: int, test_y_channel: bool = False):
    """Batched SSIM on NHWC [0,1] arrays via depthwise valid conv."""
    import jax
    import jax.numpy as jnp
    if crop_border != 0:
        img = img[:, crop_border:-crop_border, crop_border:-crop_border, :]
        img2 = img2[:, crop_border:-crop_border, crop_border:-crop_border, :]
    if test_y_channel:
        img = rgb2ycbcr_jax(img, y_only=True)
        img2 = rgb2ycbcr_jax(img2, y_only=True)
    # Work in [0, 1] with rescaled stability constants — mathematically
    # identical to the [0, 255] formulation but much better conditioned in
    # float32 (avoids cancellation in E[x^2] - mu^2 at 255^2 magnitudes).
    img = img.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    c = img.shape[-1]
    window = _gaussian_window_jax(img.dtype)
    # Depthwise 11x11 valid conv in NHWC.
    kern = jnp.tile(window[:, :, None, None], (1, 1, 1, c))  # HWIO, I=1 (depthwise)

    def conv(x):
        return jax.lax.conv_general_dilated(
            x, kern, window_strides=(1, 1), padding='VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'), feature_group_count=c)

    c1 = 0.01**2
    c2 = 0.03**2
    mu1, mu2 = conv(img), conv(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    sigma1_sq = conv(img**2) - mu1_sq
    sigma2_sq = conv(img2**2) - mu2_sq
    sigma12 = conv(img * img2) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return jnp.mean(ssim_map, axis=(1, 2, 3))


# Registry aliases: configs may name the device variants directly. The raw
# ``calculate_*_jax`` functions return per-sample arrays for in-graph use, so
# the registry entries point at the float-returning ``_pt`` wrappers (same
# math, same device execution).
METRIC_REGISTRY.register(calculate_psnr_pt, name='calculate_psnr_jax')
METRIC_REGISTRY.register(calculate_ssim_pt, name='calculate_ssim_jax')
