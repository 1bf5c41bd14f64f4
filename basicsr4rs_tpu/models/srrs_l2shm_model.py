"""L2SSingleHMModel — dual-target (HM + GT) training
(reference: basicsr/models/srrs_l2shm_model.py:17-243). The network must
return ``{'hm': ..., 'gt': ...}``; losses on both branches are combined with
``hm_loss_weight`` / ``gt_loss_weight``."""

from __future__ import annotations

from collections import OrderedDict

import jax.numpy as jnp
import numpy as np

from ..archs.arch_util import resize_bicubic
from ..parallel.mesh import shard_batch
from ..utils.registry import MODEL_REGISTRY
from .srrs_model import SRRSModel


@MODEL_REGISTRY.register()
class L2SSingleHMModel(SRRSModel):

    def __init__(self, opt):
        self.hm_weight = opt.get('hm_loss_weight', 1.0)
        self.gt_weight = opt.get('gt_loss_weight', 1.0)
        super().__init__(opt)

    def feed_data(self, data):
        self.batch_meta = {'img_name': data.get('img_name')}

        def cat_groups(groups):
            rgb = jnp.asarray(np.asarray(groups['rgb']))
            nss = jnp.asarray(np.asarray(groups['nss']))
            nss_up = resize_bicubic(nss, 2.0)
            return np.asarray(jnp.concatenate([rgb, nss_up], axis=-1))

        batch = {'lq': np.concatenate([np.asarray(data['lq']['rgb']),
                                       np.asarray(data['lq']['nss'])], axis=-1)}
        if 'gt' in data:
            batch['gt'] = cat_groups(data['gt'])
        if 'hm' in data:
            batch['hm'] = cat_groups(data['hm'])
        self.batch = shard_batch(batch, self.mesh)

    def _extract_img_name(self, val_data: dict) -> str:
        return val_data['img_name'][0]

    def _loss_terms(self, params, batch, stats=None):
        result, new_stats, _ = self._apply_net_g(params, batch['lq'], stats, train=True)
        out_hm, out_gt = result['hm'], result['gt']

        losses = OrderedDict()
        total = 0.

        def branch(output, target, tag):
            nonlocal total
            sub = 0.
            if self.cri_pix is not None:
                l_pix = self.cri_pix(output, target)
                losses[f'l_pix_{tag}'] = l_pix
                sub += l_pix
            if self.cri_perceptual is not None:
                l_p, l_s = self.cri_perceptual(output, target)
                if l_p is not None:
                    losses[f'l_percep_{tag}'] = l_p
                    sub += l_p
                if l_s is not None:
                    losses[f'l_style_{tag}'] = l_s
                    sub += l_s
            return sub

        loss_hm = branch(out_hm, batch['hm'], 'hm')
        loss_gt = branch(out_gt, batch['gt'], 'gt')
        total = self.hm_weight * loss_hm + self.gt_weight * loss_gt
        return total, (losses, out_gt, new_stats)

    def test(self):
        """Evaluate the GT branch (dual metric sets use the gt output)."""
        result = self._eval_apply(self._test_params(), self.batch['lq'])
        if isinstance(result, dict):
            self.output = result.get('gt', result.get('hm'))
            self.output_hm = result.get('hm')
        else:
            self.output = result
