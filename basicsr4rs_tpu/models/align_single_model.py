"""AlignSingleModel — trains the align autoencoder on misregistered L2S
pairs (reference: basicsr/models/align_single_model.py:18-262).

Stage 1 (registration encoder) is trained with a stage1 loss against the
bicubic-upsampled LQ; stage 2 (decoder) against the GT — typically a
``RegisteredLoss`` so the model becomes shift-invariant. The network input
is ``concat(lq_up_x3, gt)``.
"""

from __future__ import annotations

from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

from ..archs.arch_util import resize_bicubic
from ..losses import build_loss
from ..parallel.mesh import shard_batch
from ..utils.logger import get_root_logger
from ..utils.registry import MODEL_REGISTRY
from .srrs_l2s_model import L2SSingleModel


@MODEL_REGISTRY.register()
class AlignSingleModel(L2SSingleModel):

    def init_training_settings(self):
        train_opt = self.opt['train']
        self.ema_decay = train_opt.get('ema_decay', 0)
        if self.ema_decay > 0:
            get_root_logger().info(f'Use Exponential Moving Average with decay: {self.ema_decay}')

        self.stage1_loss = build_loss(train_opt['stage1_opt']) if train_opt.get('stage1_opt') else None
        self.stage2_loss = build_loss(train_opt['stage2_opt']) if train_opt.get('stage2_opt') else None
        if self.stage1_loss is None or self.stage2_loss is None:
            raise ValueError("Both 'stage1_opt' and 'stage2_opt' must be specified in the training options.")
        # keep the SRModel plumbing happy
        self.cri_pix = None
        self.cri_perceptual = None

        self.setup_optimizers()
        self._build_train_step()

    def feed_data(self, data):
        self.batch_meta = {'sample_path': data.get('sample_path'),
                           'img_name': data.get('img_name')}
        lq = jnp.asarray(np.concatenate([np.asarray(data['lq']['rgb']),
                                         np.asarray(data['lq']['nss'])], axis=-1))
        batch = {'lq': np.asarray(lq)}
        if 'gt' in data:
            gt_rgb = jnp.asarray(np.asarray(data['gt']['rgb']))
            gt_nss = jnp.asarray(np.asarray(data['gt']['nss']))
            gt = jnp.concatenate([gt_rgb, resize_bicubic(gt_nss, 2.0)], axis=-1)
            lq_up = resize_bicubic(lq, 3.0)
            batch['gt'] = np.asarray(gt)
            batch['lq_up'] = np.asarray(lq_up)
            batch['reg_input'] = np.asarray(jnp.concatenate([lq_up, gt], axis=-1))
        self.batch = shard_batch(batch, self.mesh)

    def _dummy_input(self):
        # reg_input = lq_up (C) + gt (C)
        num_in_ch = self.opt['network_g'].get('num_in_ch', 12)
        return jnp.zeros((1, 24, 24, num_in_ch), jnp.float32)

    def _loss_terms(self, params, batch, stats=None):
        output, new_stats, _ = self._apply_net_g(params, batch['reg_input'], stats, train=True)
        stage1, stage2 = output['stage1'], output['stage2']
        # the reference's quirky 1x1-with-padding conv grows spatial dims by 2
        # per AlignNet; crop back to the target grids before the losses.
        stage1 = _center_crop_to(stage1, batch['lq_up'])
        stage2 = _center_crop_to(stage2, batch['gt'])
        losses = OrderedDict()
        l1 = self.stage1_loss(stage1, batch['lq_up'])
        l2 = self.stage2_loss(stage2, batch['gt'])
        losses['stage1_loss'] = l1
        losses['stage2_loss'] = l2
        return l1 + l2, (losses, stage2, new_stats)

    def test(self):
        out = self._eval_apply(self._test_params(), self.batch['reg_input'])
        stage2 = out['stage2'] if isinstance(out, dict) else out
        self.output = _center_crop_to(stage2, self.batch['gt'])


def _center_crop_to(x, target):
    dh = x.shape[1] - target.shape[1]
    dw = x.shape[2] - target.shape[2]
    if dh == 0 and dw == 0:
        return x
    t, l = dh // 2, dw // 2
    return x[:, t:t + target.shape[1], l:l + target.shape[2], :]


# options/train/AlignAutoencoder/*.yml name this trainer ``RegistrationModel``
# (absent from the reference tree); it is the registration-AE trainer.
MODEL_REGISTRY.register(AlignSingleModel, 'RegistrationModel')
