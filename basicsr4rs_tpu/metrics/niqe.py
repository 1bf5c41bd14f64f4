"""NIQE — Natural Image Quality Evaluator (no-reference metric).

Fresh implementation of the published algorithm (Mittal et al., "Making a
'Completely Blind' Image Quality Analyzer", IEEE SPL 2013; official MATLAB
release from LIVE). Reference behavior anchor: basicsr/metrics/niqe.py:179-230,
MATLAB R2021a parity value 5.7296 on baboon.png.

Pipeline: Y-channel (MATLAB ycbcr) or gray, rounded to integers; per 96x96
block, MSCN coefficients (local mean/std normalization with a 7x7 Gaussian);
AGGD moment-matching fits of the MSCN field and of its 4 directional
pairwise products -> 18 features/block; repeated at half scale (MATLAB
bicubic downsample) -> 36 features; Mahalanobis distance between the fitted
MVG of the test blocks and a pristine MVG.

``niqe_pris_params.npz`` holds the pristine-model statistics (mu, cov, and
the 7x7 smoothing window) — public data originating from the official NIQE
release, shipped here as package data.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Sequence, Tuple

import cv2
import numpy as np
from scipy.ndimage import convolve
from scipy.special import gamma

from ..utils.matlab_functions import imresize
from ..utils.registry import METRIC_REGISTRY
from .psnr_ssim import reorder_image, to_y_channel

# Precomputed lookup for AGGD shape-parameter inversion: candidate alphas and
# the corresponding theoretical generalized-Gaussian ratio r(alpha).
_ALPHA_GRID = np.arange(0.2, 10.001, 0.001)
_inv = 1.0 / _ALPHA_GRID
_R_ALPHA = gamma(2 * _inv)**2 / (gamma(_inv) * gamma(3 * _inv))


def estimate_aggd_param(block: np.ndarray) -> Tuple[float, float, float]:
    """Moment-matching AGGD fit: returns (alpha, beta_left, beta_right)."""
    vec = block.ravel()
    left_std = np.sqrt(np.mean(vec[vec < 0]**2))
    right_std = np.sqrt(np.mean(vec[vec > 0]**2))
    gamma_hat = left_std / right_std
    r_hat = np.mean(np.abs(vec))**2 / np.mean(vec**2)
    r_hat_norm = r_hat * (gamma_hat**3 + 1) * (gamma_hat + 1) / (gamma_hat**2 + 1)**2
    alpha = _ALPHA_GRID[np.argmin((_R_ALPHA - r_hat_norm)**2)]
    scale = np.sqrt(gamma(1 / alpha) / gamma(3 / alpha))
    return alpha, left_std * scale, right_std * scale


def _block_features(block: np.ndarray) -> list:
    """18 NIQE features of one MSCN block: AGGD of the field + AGGD of the
    4 directional neighbor products (H, V, D1, D2)."""
    alpha, bl, br = estimate_aggd_param(block)
    feat = [alpha, (bl + br) / 2]
    for shift in ((0, 1), (1, 0), (1, 1), (1, -1)):
        product = block * np.roll(block, shift, axis=(0, 1))
        alpha, bl, br = estimate_aggd_param(product)
        mean = (br - bl) * (gamma(2 / alpha) / gamma(1 / alpha))
        feat.extend([alpha, mean, bl, br])
    return feat


def niqe_core(img: np.ndarray,
              mu_pris: np.ndarray,
              cov_pris: np.ndarray,
              gaussian_window: np.ndarray,
              block_h: int = 96,
              block_w: int = 96) -> float:
    """NIQE of a 2D [0,255] float image against the pristine MVG."""
    assert img.ndim == 2, 'NIQE input must be a 2D gray/Y image.'
    h, w = img.shape
    nb_h, nb_w = math.floor(h / block_h), math.floor(w / block_w)
    img = img[:nb_h * block_h, :nb_w * block_w]

    features = []
    for scale in (1, 2):
        mu = convolve(img, gaussian_window, mode='nearest')
        sigma = np.sqrt(np.abs(convolve(img**2, gaussian_window, mode='nearest') - mu**2))
        mscn = (img - mu) / (sigma + 1)

        scale_feats = []
        for iw in range(nb_w):
            for ih in range(nb_h):
                block = mscn[ih * block_h // scale:(ih + 1) * block_h // scale,
                             iw * block_w // scale:(iw + 1) * block_w // scale]
                scale_feats.append(_block_features(block))
        features.append(np.array(scale_feats))

        if scale == 1:
            img = imresize(img / 255., 0.5, antialiasing=True) * 255.

    features = np.concatenate(features, axis=1)
    mu_dist = np.nanmean(features, axis=0)
    cov_dist = np.cov(features[~np.isnan(features).any(axis=1)], rowvar=False)

    inv_cov = np.linalg.pinv((cov_pris + cov_dist) / 2)
    diff = np.ravel(mu_pris) - mu_dist
    return float(np.sqrt(diff @ inv_cov @ diff))


def load_niqe_params(params_path: Optional[str] = None):
    path = (params_path or os.environ.get('BASICSR4RS_TPU_NIQE_PARAMS')
            or os.path.join(os.path.dirname(os.path.abspath(__file__)), 'niqe_pris_params.npz'))
    params = np.load(path)
    return params['mu_pris_param'], params['cov_pris_param'], params['gaussian_window']


def _preprocess(img: np.ndarray,
                crop_border: int = 0,
                input_order: str = 'HWC',
                convert_to: Optional[str] = 'y',
                input_bands: Optional[Sequence[int]] = None,
                band: Optional[int] = None) -> np.ndarray:
    """Channel select / colorspace / crop / MATLAB rounding
    (reference niqe.py preprocess_for_niqe)."""
    img = img.astype(np.float32)
    if input_order != 'HW':
        img = reorder_image(img, input_order=input_order)
        if input_bands is not None:
            img = img[..., list(input_bands)]
        if band is not None:
            img = img[..., band]
        if convert_to == 'y':
            img = to_y_channel(img)
        elif convert_to == 'gray':
            img = cv2.cvtColor(img / 255., cv2.COLOR_BGR2GRAY) * 255.
        img = np.squeeze(img)
    if crop_border > 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border]
    return img.round()


@METRIC_REGISTRY.register()
def calculate_niqe(img, crop_border: int, input_order: str = 'HWC',
                   convert_to: str = 'y', **kwargs) -> float:
    """NIQE on a [0,255] BGR/gray image (reference niqe.py:179; MATLAB-parity
    anchor: baboon.png -> 5.7296)."""
    mu, cov, window = load_niqe_params(kwargs.get('params_path'))
    return niqe_core(_preprocess(img, crop_border, input_order, convert_to), mu, cov, window)


@METRIC_REGISTRY.register()
def calculate_rs_niqe(img, crop_border: int, input_order: str = 'HWC', convert_to: str = 'y',
                      input_bands: Sequence[int] = (2, 1, 0), **kwargs) -> float:
    """NIQE on a band subset of a multispectral image (reference niqe.py:215)."""
    mu, cov, window = load_niqe_params(kwargs.get('params_path'))
    return niqe_core(_preprocess(img, crop_border, input_order, convert_to,
                                 input_bands=input_bands), mu, cov, window)


@METRIC_REGISTRY.register()
def calculate_niqe_band(img, crop_border: int, band: int, input_order: str = 'HWC', **kwargs) -> float:
    """NIQE of a single spectral band (reference niqe.py:223)."""
    mu, cov, window = load_niqe_params(kwargs.get('params_path'))
    return niqe_core(_preprocess(img, crop_border, input_order, convert_to=None,
                                 band=band), mu, cov, window)


@METRIC_REGISTRY.register()
def calculate_niqe_none(**kwargs) -> float:
    """Stub metric (reference niqe.py:230)."""
    return -1
