"""ESRGANModel — relativistic GAN variant (reference: basicsr/models/esrgan_model.py:9-85)."""

from __future__ import annotations

from collections import OrderedDict

import jax
import jax.numpy as jnp

from ..utils.registry import MODEL_REGISTRY
from .srgan_model import SRGANModel


@MODEL_REGISTRY.register()
class ESRGANModel(SRGANModel):
    """Relativistic average GAN: D(real) - E[D(fake)] (reference :12-59)."""

    def _g_gan_loss(self, output, gt, d_params, d_stats):
        real_d_pred, _ = self._d_apply(d_params, d_stats, gt, train=True)
        real_d_pred = jax.lax.stop_gradient(real_d_pred)
        fake_g_pred, _ = self._d_apply(d_params, d_stats, output, train=True)
        l_g_real = self.cri_gan(real_d_pred - jnp.mean(fake_g_pred), False, is_disc=False)
        l_g_fake = self.cri_gan(fake_g_pred - jnp.mean(real_d_pred), True, is_disc=False)
        return (l_g_real + l_g_fake) / 2

    def _d_losses(self, d_params, d_stats, gt, output_detached):
        # real (reference esrgan_model.py:39-46)
        fake_d_pred_const, _ = self._d_apply(d_params, d_stats, output_detached, train=True)
        fake_d_pred_const = jax.lax.stop_gradient(fake_d_pred_const)
        real_d_pred, d_stats = self._d_apply(d_params, d_stats, gt, train=True)
        l_d_real = self.cri_gan(real_d_pred - jnp.mean(fake_d_pred_const), True, is_disc=True) * 0.5
        # fake (reference :48-55)
        fake_d_pred, d_stats = self._d_apply(d_params, d_stats, output_detached, train=True)
        l_d_fake = self.cri_gan(
            fake_d_pred - jnp.mean(jax.lax.stop_gradient(real_d_pred)), False, is_disc=True) * 0.5
        logs = OrderedDict(l_d_real=l_d_real, l_d_fake=l_d_fake,
                           out_d_real=jnp.mean(real_d_pred), out_d_fake=jnp.mean(fake_d_pred))
        return l_d_real + l_d_fake, logs, d_stats
