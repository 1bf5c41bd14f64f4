"""GAN losses and regularizers (reference: basicsr/losses/gan_loss.py:11-207)."""

from __future__ import annotations

from typing import List, Union

import jax
import jax.numpy as jnp

from ..utils.registry import LOSS_REGISTRY


@LOSS_REGISTRY.register()
class GANLoss:
    """vanilla (BCE-with-logits) / lsgan (MSE) / wgan / wgan_softplus / hinge.

    ``loss_weight`` applies only to generator updates (reference
    gan_loss.py:112); callers pass ``is_disc=True`` for discriminator terms.
    """

    def __init__(self, gan_type: str, real_label_val: float = 1.0,
                 fake_label_val: float = 0.0, loss_weight: float = 1.0):
        self.gan_type = gan_type
        self.real_label_val = real_label_val
        self.fake_label_val = fake_label_val
        self.loss_weight = loss_weight
        if gan_type not in ('vanilla', 'lsgan', 'wgan', 'wgan_softplus', 'hinge'):
            raise NotImplementedError(f'GAN type {gan_type} is not implemented.')

    def _loss(self, pred, target_is_real: bool, is_disc: bool):
        if self.gan_type == 'vanilla':
            target = jnp.full_like(pred, self.real_label_val if target_is_real else self.fake_label_val)
            # BCE with logits
            return jnp.mean(jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred))))
        if self.gan_type == 'lsgan':
            target = jnp.full_like(pred, self.real_label_val if target_is_real else self.fake_label_val)
            return jnp.mean((pred - target)**2)
        if self.gan_type == 'wgan':
            return -jnp.mean(pred) if target_is_real else jnp.mean(pred)
        if self.gan_type == 'wgan_softplus':
            return jnp.mean(jax.nn.softplus(-pred)) if target_is_real else jnp.mean(jax.nn.softplus(pred))
        # hinge
        if is_disc:
            pred = -pred if target_is_real else pred
            return jnp.mean(jnp.maximum(1 + pred, 0))
        return -jnp.mean(pred)

    def __call__(self, pred, target_is_real: bool, is_disc: bool = False):
        loss = self._loss(pred, target_is_real, is_disc)
        return loss if is_disc else loss * self.loss_weight


@LOSS_REGISTRY.register()
class MultiScaleGANLoss(GANLoss):
    """Average GANLoss over multi-scale predictions (reference gan_loss.py:116-140)."""

    def __call__(self, pred: Union[List, jnp.ndarray], target_is_real: bool, is_disc: bool = False):
        if isinstance(pred, list):
            loss = 0.
            for pred_i in pred:
                if isinstance(pred_i, list):
                    pred_i = pred_i[-1]
                loss += super().__call__(pred_i, target_is_real, is_disc)
            return loss / len(pred)
        return super().__call__(pred, target_is_real, is_disc)


def r1_penalty(d_fn, real_img):
    """R1 gradient penalty: E[|grad D(x)|^2] on real images
    (reference gan_loss.py:143-157), expressed with jax.grad."""

    def scalar_d(x):
        return jnp.sum(d_fn(x))

    grad = jax.grad(scalar_d)(real_img)
    return jnp.mean(jnp.sum(grad**2, axis=(1, 2, 3)))


def g_path_regularize(fake_fn, latents, mean_path_length, rng, decay: float = 0.01):
    """StyleGAN2 path-length regularization (reference gan_loss.py:159-169).

    ``fake_fn(latents) -> image``; differentiates the noise-weighted output
    w.r.t. latents.
    """

    def proj(z):
        img = fake_fn(z)
        noise = jax.random.normal(rng, img.shape) / jnp.sqrt(img.shape[1] * img.shape[2])
        return jnp.sum(img * noise)

    grad = jax.grad(proj)(latents)
    path_lengths = jnp.sqrt(jnp.mean(jnp.sum(grad**2, axis=2), axis=1) + 1e-12)
    path_mean = mean_path_length + decay * (jnp.mean(path_lengths) - mean_path_length)
    path_penalty = jnp.mean((path_lengths - path_mean)**2)
    return path_penalty, jax.lax.stop_gradient(path_lengths), jax.lax.stop_gradient(path_mean)


def gradient_penalty_loss(d_fn, real_data, fake_data, rng, weight=None):
    """WGAN-GP interpolated gradient penalty (reference gan_loss.py:171-207)."""
    alpha = jax.random.uniform(rng, (real_data.shape[0], 1, 1, 1))
    interpolates = alpha * real_data + (1. - alpha) * fake_data

    def scalar_d(x):
        return jnp.sum(d_fn(x))

    grad = jax.grad(scalar_d)(interpolates)
    if weight is not None:
        grad = grad * weight
    # the reference norms over the CHANNEL dim only (gan_loss.py:203:
    # gradients.norm(2, dim=1) on NCHW) — a per-pixel channel norm, not the
    # flattened per-sample norm of the original WGAN-GP paper
    loss = jnp.mean((jnp.sqrt(jnp.sum(grad**2, axis=3) + 1e-12) - 1)**2)
    if weight is not None:
        loss = loss / jnp.mean(weight)
    return loss
