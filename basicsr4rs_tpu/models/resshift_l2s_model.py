"""ResShift over L2S nested rgb/nss batches
(reference: basicsr/models/resshift_l2s_model.py:22-330) and the HM variant
(reference: basicsr/models/rsresdiff_hm_model.py:22-212)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from os import path as osp

from ..archs.arch_util import resize_bicubic
from ..parallel.mesh import shard_batch
from ..utils.registry import MODEL_REGISTRY
from .resshift_model import ResShiftModel


@MODEL_REGISTRY.register()
class ResShiftL2SModel(ResShiftModel):
    """Nested lq/gt dict feed like L2SSingleModel, diffusion training like
    ResShiftModel."""

    def feed_data(self, data):
        self.batch_meta = {'sample_path': data.get('sample_path'),
                           'img_name': data.get('img_name')}
        lq = np.concatenate([np.asarray(data['lq']['rgb']),
                             np.asarray(data['lq']['nss'])], axis=-1)
        batch = {'lq': lq}
        if 'gt' in data:
            gt_rgb = jnp.asarray(np.asarray(data['gt']['rgb']))
            gt_nss = jnp.asarray(np.asarray(data['gt']['nss']))
            batch['gt'] = np.asarray(jnp.concatenate(
                [gt_rgb, resize_bicubic(gt_nss, 2.0)], axis=-1))
        self.batch = shard_batch(batch, self.mesh)

    def _extract_img_name(self, val_data: dict) -> str:
        return val_data['img_name'][0]

    def _save_visuals(self, dataset: str, img_name: str, images: dict):
        vis_path = self.opt['path']['visualization']
        rgb, nss = {}, {}
        for name, img in images.items():
            if img is None:
                continue
            rgb[name] = img[..., :3]
            if img.shape[-1] > 3:
                nss[name] = img[..., 3:]
        self.rswrite(osp.join(vis_path, 'RGB', dataset, img_name), rgb, is_rgb_order=True)
        if nss:
            self.rswrite(osp.join(vis_path, 'NSS', dataset, img_name), nss, is_rgb_order=True)


@MODEL_REGISTRY.register()
class RSResDiffHMModel(ResShiftL2SModel):
    """ResShift trained against histogram-matched targets
    (reference rsresdiff_hm_model.py:22): identical machinery, the HM targets
    arrive under data['hm'] and replace the GT for the diffusion objective."""

    def feed_data(self, data):
        if 'hm' in data:
            data = dict(data)
            data['gt'] = data['hm']
        super().feed_data(data)


# Shipped ResDiff configs (options/train/ResDiff/*.yml) use the pre-rename
# model name; the class is absent from the reference tree — alias to the
# pixel-space L2S ResShift model they describe.
MODEL_REGISTRY.register(ResShiftL2SModel, 'RSResDiffModel')
