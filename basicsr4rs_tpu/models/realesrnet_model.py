"""RealESRNetModel — MSE-track Real-ESRGAN with on-device degradation
synthesis (reference: basicsr/models/realesrnet_model.py:15-189)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.degradation_pipeline import (RealESRGANDegrader, TrainingPairPool,
                                        paired_random_crop_traced)
from ..parallel.mesh import shard_batch
from ..utils.registry import MODEL_REGISTRY
from .sr_model import SRModel


class _SynthesisMixin:
    """Shared feed_data with jitted synthesis + training-pair pool."""

    def _init_synthesis(self):
        self.degrader = RealESRGANDegrader(self.opt)
        self.pool = None
        self._synth_fn = None
        self.synth_rng = jax.random.PRNGKey(self.opt.get('manual_seed', 0) or 0)
        self.synth_rng = jax.random.fold_in(self.synth_rng, jax.process_index() + 7)

    def _build_synth(self, gt_shape):
        gt_size = self.opt['gt_size']
        scale = self.opt['scale']
        queue_size = self.opt.get('queue_size', 180)
        lq_size = gt_size // scale
        self.pool = TrainingPairPool(queue_size, (lq_size, lq_size, gt_shape[-1]),
                                     (gt_size, gt_size, gt_shape[-1]))
        self.pool_state = self.pool.init_state()

        @jax.jit
        @self.kernel_scope()
        def synth(key, pool_state, gt, kernel1, kernel2, sinc_kernel):
            k_deg, k_crop, k_pool = jax.random.split(key, 3)
            lq, gt_out, gt_usm = self.degrader(k_deg, gt, kernel1, kernel2, sinc_kernel)
            (gt_c, gt_usm_c), lq_c = paired_random_crop_traced(
                k_crop, [gt_out, gt_usm], lq, gt_size, scale)
            pool_state, lq_c, gt_c = self.pool.update(k_pool, pool_state, lq_c, gt_c)
            # re-sharpen after pool swap (reference realesrgan_model.py:180)
            gt_usm_c = self.degrader.usm(gt_c)
            return pool_state, lq_c, gt_c, gt_usm_c

        self._synth_fn = synth

    def feed_data(self, data):
        if self.is_train and self.opt.get('high_order_degradation', True) and 'gt' in data and 'kernel1' in data:
            # accept host numpy OR already-device arrays (device prefetcher);
            # np.shape avoids the D2H fetch np.asarray would force
            gt = data['gt']
            if self._synth_fn is None:
                self._build_synth(np.shape(gt))
            self.synth_rng, key = jax.random.split(self.synth_rng)
            self.pool_state, lq, gt_c, gt_usm = self._synth_fn(
                key, self.pool_state, jnp.asarray(gt), jnp.asarray(data['kernel1']),
                jnp.asarray(data['kernel2']), jnp.asarray(data['sinc_kernel']))
            batch = {'lq': lq, 'gt': gt_c, 'gt_usm': gt_usm}
            self.batch = shard_batch(batch, self.mesh)
            self.batch_meta = {}
        else:
            super().feed_data(data)
            if 'gt' in self.batch:
                self.batch['gt_usm'] = self.degrader.usm(self.batch['gt'])

    def nondist_validation(self, dataloader, current_iter, tb_logger, save_img):
        """Validation skips synthesis (reference realesrnet_model.py:187)."""
        is_train = self.is_train
        self.is_train = False
        super().nondist_validation(dataloader, current_iter, tb_logger, save_img)
        self.is_train = is_train


@MODEL_REGISTRY.register()
class RealESRNetModel(_SynthesisMixin, SRModel):

    def __init__(self, opt):
        super().__init__(opt)
        self._init_synthesis()

    def _loss_terms(self, params, batch, stats=None):
        # L1 against USM-sharpened GT unless disabled (reference
        # realesrnet_model.py / realesrgan_model.py gt_usm flags).
        target = batch['gt_usm'] if self.opt.get('gt_usm', True) and 'gt_usm' in batch else batch['gt']
        batch_eff = dict(batch)
        batch_eff['gt'] = target
        return super()._loss_terms(params, batch_eff, stats)
