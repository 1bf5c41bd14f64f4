"""RealESRGANModel — GAN-track Real-ESRGAN with on-device degradation
synthesis (reference: basicsr/models/realesrgan_model.py:17-267)."""

from __future__ import annotations

from collections import OrderedDict

from ..utils.registry import MODEL_REGISTRY
from .realesrnet_model import _SynthesisMixin
from .srgan_model import SRGANModel


@MODEL_REGISTRY.register()
class RealESRGANModel(_SynthesisMixin, SRGANModel):
    """Per-loss USM-target selection (reference realesrgan_model.py:190-215):
    l1_gt_usm / percep_gt_usm / gan_gt_usm flags pick sharpened or plain GT."""

    def __init__(self, opt):
        super().__init__(opt)
        self._init_synthesis()

    def _g_losses(self, g_params, batch, d_params, d_stats, ema_params=None):
        gt = batch['gt']
        gt_usm = batch.get('gt_usm', gt)
        l1_gt = gt_usm if self.opt.get('l1_gt_usm', True) else gt
        percep_gt = gt_usm if self.opt.get('percep_gt_usm', True) else gt
        gan_gt = gt_usm if self.opt.get('gan_gt_usm', False) else gt

        output = self.net_g.apply({'params': g_params}, batch['lq'])
        losses = OrderedDict()
        total = 0.
        if self.cri_pix is not None:
            l_g_pix = self.cri_pix(output, l1_gt)
            losses['l_g_pix'] = l_g_pix
            total += l_g_pix
        if self.cri_ldl is not None:
            # LDL map uses the plain (non-USM) gt (reference realesrgan_model.py:223)
            l_g_ldl = self._ldl_loss(output, gt, batch['lq'], ema_params)
            losses['l_g_ldl'] = l_g_ldl
            total += l_g_ldl
        if self.cri_perceptual is not None:
            l_percep, l_style = self.cri_perceptual(output, percep_gt)
            if l_percep is not None:
                losses['l_g_percep'] = l_percep
                total += l_percep
            if l_style is not None:
                losses['l_g_style'] = l_style
                total += l_style
        l_g_gan = self._g_gan_loss(output, gan_gt, d_params, d_stats)
        losses['l_g_gan'] = l_g_gan
        total += l_g_gan
        losses['l_g_total'] = total
        return total, (losses, output)

    def _gan_gt(self, batch):
        # D trains against the (possibly USM) gan_gt (reference :216-240).
        if self.opt.get('gan_gt_usm', False) and 'gt_usm' in batch:
            return batch['gt_usm']
        return batch['gt']
