"""Perceptual (VGG feature) loss (reference: basicsr/losses/basic_loss.py:147-253)."""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..archs.vgg_arch import VGGFeatureExtractor, load_vgg_params
from ..utils.registry import LOSS_REGISTRY


def _gram(x: jnp.ndarray) -> jnp.ndarray:
    """Gram matrix of NHWC features (reference basic_loss.py:255-268)."""
    n, h, w, c = x.shape
    feat = x.reshape(n, h * w, c)
    return jnp.einsum('nic,nid->ncd', feat, feat) / (c * h * w)


@LOSS_REGISTRY.register()
class PerceptualLoss:
    """VGG-feature perceptual + optional Gram style loss. The frozen VGG
    params are captured as jit constants."""

    def __init__(self,
                 layer_weights: Dict[str, float],
                 vgg_type: str = 'vgg19',
                 use_input_norm: bool = True,
                 range_norm: bool = False,
                 perceptual_weight: float = 1.0,
                 style_weight: float = 0.,
                 criterion: str = 'l1',
                 pretrain_path: Optional[str] = None,
                 vgg_params=None):
        self.layer_weights = layer_weights
        self.perceptual_weight = perceptual_weight
        self.style_weight = style_weight
        self.criterion_type = criterion
        self.vgg = VGGFeatureExtractor(
            layer_name_list=tuple(layer_weights.keys()), vgg_type=vgg_type,
            use_input_norm=use_input_norm, range_norm=range_norm)
        self.vgg_params = (vgg_params if vgg_params is not None
                           else load_vgg_params(self.vgg, pretrain_path=pretrain_path))

    def _crit(self, a, b):
        if self.criterion_type == 'l1':
            return jnp.mean(jnp.abs(a - b))
        if self.criterion_type in ('l2', 'mse'):
            return jnp.mean((a - b)**2)
        if self.criterion_type == 'fro':
            return jnp.linalg.norm(a - b)
        raise NotImplementedError(f'{self.criterion_type} criterion has not been supported.')

    def __call__(self, x, gt) -> Tuple[Optional[jnp.ndarray], Optional[jnp.ndarray]]:
        x_features = self.vgg.apply({'params': self.vgg_params}, x)
        gt_features = self.vgg.apply({'params': self.vgg_params}, jax.lax.stop_gradient(gt))

        percep_loss = None
        if self.perceptual_weight > 0:
            percep_loss = 0.
            for k in x_features.keys():
                percep_loss += self._crit(x_features[k], gt_features[k]) * self.layer_weights[k]
            percep_loss = percep_loss * self.perceptual_weight

        style_loss = None
        if self.style_weight > 0:
            style_loss = 0.
            for k in x_features.keys():
                style_loss += self._crit(_gram(x_features[k]), _gram(gt_features[k])) * self.layer_weights[k]
            style_loss = style_loss * self.style_weight

        return percep_loss, style_loss
