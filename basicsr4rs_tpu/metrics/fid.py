"""FID: Frechet Inception Distance (reference: basicsr/metrics/fid.py:10-89).

Feature extraction is a jitted InceptionV3 apply over batches on the
accelerator; the Frechet distance itself is tiny dense algebra, computed
host-side with scipy (matching the reference's numerics exactly).
"""

from __future__ import annotations

import os
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..archs.inception import LOCAL_FID_WEIGHTS, InceptionV3


def load_patched_inception_v3(weights_path: Optional[str] = None,
                              resize_input: bool = True,
                              normalize_input: bool = False):
    """Build the FID InceptionV3 and return ``(net, params)``
    (reference fid.py:10-15). ``weights_path`` is a converted torch
    checkpoint (``pt_inception-2015-12-05``); defaults to the reference's
    local path. Raises if no weights are found — FID is meaningless with a
    random inception."""
    net = InceptionV3(output_blocks=(3,), resize_input=resize_input,
                      normalize_input=normalize_input)
    weights_path = weights_path or LOCAL_FID_WEIGHTS
    if not os.path.exists(weights_path):
        raise FileNotFoundError(
            f'FID inception weights not found at {weights_path}. Download '
            f'pt_inception-2015-12-05-6726825d.pth (see archs/inception.py) '
            'and point weights_path at it.')
    from ..utils.torch_convert import load_torch_checkpoint
    params = load_torch_checkpoint(weights_path, 'params', template=None,
                                   rules=InceptionV3.TORCH_KEY_RULES)
    return net, params


def extract_inception_features(data_generator: Iterable, inception, params,
                               len_generator: Optional[int] = None) -> np.ndarray:
    """Extract pooled inception features over a generator of NHWC batches
    (reference fid.py:18-47)."""
    apply = jax.jit(lambda p, x: inception.apply({'params': p}, x)[0])
    feats = []
    for data in data_generator:
        out = apply(params, jnp.asarray(data))
        feats.append(np.asarray(out).reshape(out.shape[0], -1))
    return np.concatenate(feats, axis=0)


def calculate_stats(features: np.ndarray):
    """Sample mean + covariance of a feature matrix (rows = samples)."""
    mu = np.mean(features, axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def calculate_fid(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Frechet distance between two Gaussians (reference fid.py:50-89):
    ``||mu1 - mu2||^2 + Tr(C1 + C2 - 2 sqrt(C1 C2))``."""
    from scipy import linalg
    assert mu1.shape == mu2.shape, 'Two mean vectors have different lengths'
    assert sigma1.shape == sigma2.shape, 'Two covariances have different dimensions'

    cov_sqrt = linalg.sqrtm(sigma1 @ sigma2)
    if not np.isfinite(cov_sqrt).all():
        print(f'Product of cov matrices is singular. Adding {eps} to diagonal of cov estimates')
        offset = np.eye(sigma1.shape[0]) * eps
        cov_sqrt = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))

    if np.iscomplexobj(cov_sqrt):
        if not np.allclose(np.diagonal(cov_sqrt).imag, 0, atol=1e-3):
            m = np.max(np.abs(cov_sqrt.imag))
            raise ValueError(f'Imaginary component {m}')
        cov_sqrt = cov_sqrt.real

    mean_diff = mu1 - mu2
    return float(mean_diff @ mean_diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(cov_sqrt))
