"""Pixel losses (reference: basicsr/losses/basic_loss.py:28-253).

Losses are stateless callables over NHWC jax arrays, usable directly inside
jitted train steps. ``PerceptualLoss`` lives in ``perceptual_loss.py`` (needs
the VGG feature extractor).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp

from ..utils.registry import LOSS_REGISTRY
from .loss_util import weighted_loss

_reduction_modes = ['none', 'mean', 'sum']


@weighted_loss
def l1_loss(pred, target):
    return jnp.abs(pred - target)


@weighted_loss
def mse_loss(pred, target):
    return (pred - target)**2


@weighted_loss
def charbonnier_loss(pred, target, eps: float = 1e-12):
    return jnp.sqrt((pred - target)**2 + eps)


@LOSS_REGISTRY.register()
class L1Loss:
    """(reference basic_loss.py:28-53)"""

    def __init__(self, loss_weight: float = 1.0, reduction: str = 'mean'):
        if reduction not in _reduction_modes:
            raise ValueError(f'Unsupported reduction mode: {reduction}. Supported ones are: {_reduction_modes}')
        self.loss_weight = loss_weight
        self.reduction = reduction

    def __call__(self, pred, target, weight=None, **kwargs):
        return self.loss_weight * l1_loss(pred, target, weight, reduction=self.reduction)


@LOSS_REGISTRY.register()
class MSELoss:
    """(reference basic_loss.py:56-81)"""

    def __init__(self, loss_weight: float = 1.0, reduction: str = 'mean'):
        if reduction not in _reduction_modes:
            raise ValueError(f'Unsupported reduction mode: {reduction}. Supported ones are: {_reduction_modes}')
        self.loss_weight = loss_weight
        self.reduction = reduction

    def __call__(self, pred, target, weight=None, **kwargs):
        return self.loss_weight * mse_loss(pred, target, weight, reduction=self.reduction)


@LOSS_REGISTRY.register()
class CharbonnierLoss:
    """Differentiable L1 variant, eps 1e-12 (reference basic_loss.py:84-115)."""

    def __init__(self, loss_weight: float = 1.0, reduction: str = 'mean', eps: float = 1e-12):
        if reduction not in _reduction_modes:
            raise ValueError(f'Unsupported reduction mode: {reduction}. Supported ones are: {_reduction_modes}')
        self.loss_weight = loss_weight
        self.reduction = reduction
        self.eps = eps

    def __call__(self, pred, target, weight=None, **kwargs):
        return self.loss_weight * charbonnier_loss(pred, target, weight, eps=self.eps, reduction=self.reduction)


@LOSS_REGISTRY.register()
class WeightedTVLoss(L1Loss):
    """Total variation via shifted-L1 (reference basic_loss.py:118-144). NHWC."""

    def __init__(self, loss_weight: float = 1.0, reduction: str = 'mean'):
        if reduction not in ['mean', 'sum']:
            raise ValueError(f'Unsupported reduction mode: {reduction}. Supported ones are: mean | sum')
        super().__init__(loss_weight=loss_weight, reduction=reduction)

    def __call__(self, pred, weight=None, **kwargs):
        y_weight = None if weight is None else weight[:, :-1, :, :]
        x_weight = None if weight is None else weight[:, :, :-1, :]
        y_diff = super().__call__(pred[:, :-1, :, :], pred[:, 1:, :, :], weight=y_weight)
        x_diff = super().__call__(pred[:, :, :-1, :], pred[:, :, 1:, :], weight=x_weight)
        return x_diff + y_diff


@LOSS_REGISTRY.register()
class GANFeatLoss:
    """Discriminator feature-matching loss for multiscale patch GANs
    (pix2pixHD-style; consumed by HiFaceGANModel via ``feature_matching_opt``,
    reference hifacegan_model.py:46-49,150-154). Input is a list (per
    discriminator scale) of lists of intermediate feature maps."""

    def __init__(self, criterion: str = 'l1', loss_weight: float = 1.0,
                 reduction: str = 'mean'):
        if criterion == 'l1':
            self.loss_op = l1_loss
        elif criterion in ('l2', 'mse'):
            self.loss_op = mse_loss
        elif criterion == 'charbonnier':
            self.loss_op = charbonnier_loss
        else:
            raise ValueError(f'Unsupported loss mode: {criterion}. Supported ones are: l1|l2|charbonnier')
        self.loss_weight = loss_weight
        self.reduction = reduction

    def __call__(self, pred_fake, pred_real):
        import jax
        num_d = len(pred_fake)
        loss = 0.
        for fake_feats, real_feats in zip(pred_fake, pred_real):
            for f, r in zip(fake_feats[:-1], real_feats[:-1]):
                loss += self.loss_op(f, jax.lax.stop_gradient(r),
                                     reduction=self.reduction) / num_d
        return loss * self.loss_weight
