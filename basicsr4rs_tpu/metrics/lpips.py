"""LPIPS perceptual metric (reference: basicsr/metrics/lpips.py:1-171).

The reference delegates to ``pyiqa``'s LPIPS (AlexNet backbone + learned
linear heads). Here the whole evaluator is a jitted flax module; weights are
converted from the standard torch files (torchvision ``alexnet`` features +
the ``lpips`` repo's ``alex.pth`` linear heads) via ``load_lpips_weights``.
Without weight files the metric raises a clear error —
``calculate_lpips_none`` (always ``-1``) mirrors the reference placeholder.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..utils.registry import METRIC_REGISTRY

# LPIPS input standardization constants (lpips.ScalingLayer)
_SHIFT = np.array([-.030, -.088, -.188], np.float32)
_SCALE = np.array([.458, .448, .450], np.float32)

LOCAL_LPIPS_ALEXNET = 'experiments/pretrained_models/alexnet-owt.pth'
LOCAL_LPIPS_LIN = 'experiments/pretrained_models/lpips_alex_v0.1.pth'


class _AlexFeatures(nn.Module):
    """torchvision AlexNet ``features`` trunk, returning the five relu taps
    LPIPS uses."""
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        taps = []

        def conv(i, feats, k, s, p, v):
            return nn.Conv(feats, (k, k), strides=s, padding=p, dtype=self.dtype,
                           name=f'features_{i}')(v)

        def pool(v):
            return jax.lax.reduce_window(v, -jnp.inf, jax.lax.max,
                                         (1, 3, 3, 1), (1, 2, 2, 1),
                                         [(0, 0), (0, 0), (0, 0), (0, 0)])

        x = nn.relu(conv(0, 64, 11, 4, 2, x))
        taps.append(x)
        x = pool(x)
        x = nn.relu(conv(3, 192, 5, 1, 2, x))
        taps.append(x)
        x = pool(x)
        x = nn.relu(conv(6, 384, 3, 1, 1, x))
        taps.append(x)
        x = nn.relu(conv(8, 256, 3, 1, 1, x))
        taps.append(x)
        x = nn.relu(conv(10, 256, 3, 1, 1, x))
        taps.append(x)
        return taps


class LPIPS(nn.Module):
    """AlexNet-LPIPS: unit-normalize each tap, 1x1 linear head on the squared
    difference, spatial mean, sum over taps."""
    dtype: Any = None

    CHANNELS = (64, 192, 384, 256, 256)

    @nn.compact
    def __call__(self, x, y):
        """x, y: NHWC RGB in [-1, 1]; returns (n,) distances."""
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        net = _AlexFeatures(dtype=self.dtype, name='net')
        fx = net((x - shift) / scale)
        fy = net((y - shift) / scale)
        total = 0.
        for i, (ax, ay) in enumerate(zip(fx, fy)):
            ax = ax * jax.lax.rsqrt(jnp.sum(ax**2, axis=-1, keepdims=True) + 1e-10)
            ay = ay * jax.lax.rsqrt(jnp.sum(ay**2, axis=-1, keepdims=True) + 1e-10)
            diff = (ax - ay)**2
            w = self.param(f'lin{i}', nn.initializers.ones, (self.CHANNELS[i],))
            total = total + jnp.mean(jnp.sum(diff * jax.nn.relu(w), axis=-1), axis=(1, 2))
        return total


def load_lpips_weights(alexnet_path: Optional[str] = None,
                       lin_path: Optional[str] = None):
    """Convert torchvision-alexnet + lpips-linear torch files into LPIPS
    params. Raises FileNotFoundError when the files are absent (no network
    egress here — download them offline)."""
    alexnet_path = alexnet_path or LOCAL_LPIPS_ALEXNET
    lin_path = lin_path or LOCAL_LPIPS_LIN
    for p in (alexnet_path, lin_path):
        if not os.path.exists(p):
            raise FileNotFoundError(
                f'LPIPS weight file missing: {p}. Download torchvision alexnet '
                'weights and lpips alex v0.1 linear weights, then point '
                'load_lpips_weights at them.')
    import torch
    from ..utils.torch_convert import convert_tensor
    alex = torch.load(alexnet_path, map_location='cpu', weights_only=True)
    lins = torch.load(lin_path, map_location='cpu', weights_only=True)
    params = {'net': {}}
    for i in (0, 3, 6, 8, 10):
        params['net'][f'features_{i}'] = {
            'kernel': convert_tensor('kernel', alex[f'features.{i}.weight'].numpy()),
            'bias': alex[f'features.{i}.bias'].numpy(),
        }
    for i in range(5):
        w = lins[f'lin{i}.model.1.weight'].numpy()  # (1, c, 1, 1)
        params[f'lin{i}'] = w.reshape(-1)
    return params


_EVALUATOR = {}


def _get_evaluator(**kwargs):
    if 'fn' not in _EVALUATOR:
        net = LPIPS()
        params = load_lpips_weights(kwargs.get('alexnet_path'), kwargs.get('lin_path'))
        _EVALUATOR['fn'] = jax.jit(lambda a, b: net.apply({'params': params}, a, b))
    return _EVALUATOR['fn']


def compute_lpips_score(img: np.ndarray, img2: np.ndarray, **kwargs) -> float:
    """LPIPS between two (H, W) grayscale uint8-range images
    (reference lpips.py:74-103): replicate to RGB, scale to [-1, 1]."""
    assert img.ndim == 2 and img2.ndim == 2, 'inputs must be (H, W) single-band images'
    a = np.stack([img] * 3, axis=-1).astype(np.float32) / 255.0 * 2 - 1
    b = np.stack([img2] * 3, axis=-1).astype(np.float32) / 255.0 * 2 - 1
    fn = _get_evaluator(**kwargs)
    score = fn(jnp.asarray(a[None]), jnp.asarray(b[None]))
    return float(np.asarray(score)[0])


@METRIC_REGISTRY.register()
def calculate_lpips_band(img, img2, crop_border, band, input_order='HWC', **kwargs):
    """LPIPS on one band (reference lpips.py:106-145)."""
    assert img.shape == img2.shape, f'Image shapes are different: {img.shape}, {img2.shape}.'
    if input_order == 'HWC':
        assert band < img.shape[2]
        img_band, img2_band = img[:, :, band], img2[:, :, band]
    elif input_order == 'CHW':
        assert band < img.shape[0]
        img_band, img2_band = img[band], img2[band]
    else:
        raise ValueError(f'Wrong input_order {input_order}. Supported input_orders are "HWC" and "CHW".')
    if crop_border > 0:
        img_band = img_band[crop_border:-crop_border, crop_border:-crop_border]
        img2_band = img2_band[crop_border:-crop_border, crop_border:-crop_border]
    return compute_lpips_score(img_band, img2_band, **kwargs)


@METRIC_REGISTRY.register()
def calculate_lpips_none(**kwargs):
    """(reference lpips.py:148-150)"""
    return -1
