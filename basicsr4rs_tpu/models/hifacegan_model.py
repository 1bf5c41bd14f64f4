"""HiFaceGAN face-renovation model
(reference: basicsr/models/hifacegan_model.py:14-288).

Differences from SRGANModel: the discriminator is conditional (fake/real are
concatenated with the LQ input) and multiscale — fake and real go through D
in ONE combined batch (the reference does this to keep norm statistics
consistent, :76-96) and the nested feature lists feed a feature-matching
loss. Everything stays one jitted G+D step; the fake/real split of the
combined batch is a static slice."""

from __future__ import annotations

from collections import OrderedDict

import jax.numpy as jnp

from ..losses import build_loss
from ..utils.registry import MODEL_REGISTRY
from .srgan_model import SRGANModel


@MODEL_REGISTRY.register()
class HiFaceGANModel(SRGANModel):

    def init_training_settings(self):
        if self.opt['train'].get('ema_decay', 0) > 0:
            raise NotImplementedError('HiFaceGAN does not support EMA now. Pass')
        super().init_training_settings()
        train_opt = self.opt['train']
        self.cri_feat = (build_loss(train_opt['feature_matching_opt'])
                         if train_opt.get('feature_matching_opt') else None)
        if self.cri_pix is None and self.cri_perceptual is None:
            raise ValueError('Both pixel and perceptual losses are None.')

    def _d_dummy_input(self):
        d_opt = self.opt['network_d']
        ch = d_opt.get('num_in_ch', 3)
        if d_opt.get('conditional_d', True):
            ch += d_opt.get('num_out_ch', 3)
        size = d_opt.get('input_size', 64)
        return jnp.zeros((1, size, size, ch), jnp.float32)

    # ------------------------------------------------------- conditional D
    def _discriminate(self, d_params, d_stats, lq, output, gt):
        """(reference hifacegan_model.py:76-96): one combined fake+real batch
        through the multiscale D, then split each feature map in half."""
        from ..archs.hifacegan_util import nearest_resize_to
        size = output.shape[1:3]
        lq = nearest_resize_to(lq, size)
        gt = nearest_resize_to(gt, size)
        fake_concat = jnp.concatenate([lq, output], axis=-1)
        real_concat = jnp.concatenate([lq, gt], axis=-1)
        fake_and_real = jnp.concatenate([fake_concat, real_concat], axis=0)
        out, _ = self._d_apply(d_params, d_stats, fake_and_real, train=True)
        half = fake_concat.shape[0]
        pred_fake = [[t[:half] for t in scale] for scale in out]
        pred_real = [[t[half:] for t in scale] for scale in out]
        return pred_fake, pred_real

    def _g_losses(self, g_params, batch, d_params, d_stats, ema_params=None):
        output = self.net_g.apply({'params': g_params}, batch['lq'])
        losses = OrderedDict()
        total = 0.
        if self.cri_pix is not None:
            l_g_pix = self.cri_pix(output, batch['gt'])
            losses['l_g_pix'] = l_g_pix
            total += l_g_pix
        if self.cri_perceptual is not None:
            l_percep, l_style = self.cri_perceptual(output, batch['gt'])
            if l_percep is not None:
                losses['l_g_percep'] = l_percep
                total += l_percep
            if l_style is not None:
                losses['l_g_style'] = l_style
                total += l_style
        pred_fake, pred_real = self._discriminate(d_params, d_stats, batch['lq'],
                                                  output, batch['gt'])
        l_g_gan = self.cri_gan(pred_fake, True, is_disc=False)
        losses['l_g_gan'] = l_g_gan
        total += l_g_gan
        if self.cri_feat is not None:
            l_g_feat = self.cri_feat(pred_fake, pred_real)
            losses['l_g_feat'] = l_g_feat
            total += l_g_feat
        losses['l_g_total'] = total
        return total, (losses, output)

    def _gan_gt(self, batch):
        # D needs both lq (conditioning) and gt — pass the batch through
        return {'lq': batch['lq'], 'gt': batch['gt']}

    def _d_losses(self, d_params, d_stats, gt, output_detached):
        batch = gt  # dict from _gan_gt
        pred_fake, pred_real = self._discriminate(d_params, d_stats, batch['lq'],
                                                  output_detached, batch['gt'])
        l_d_real = self.cri_gan(pred_real, True, is_disc=True)
        l_d_fake = self.cri_gan(pred_fake, False, is_disc=True)
        logs = OrderedDict(l_d_real=l_d_real, l_d_fake=l_d_fake)
        return (l_d_real + l_d_fake) / 2, logs, d_stats
