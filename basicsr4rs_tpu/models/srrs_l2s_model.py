"""L2SSingleModel — Landsat->Sentinel paired training
(reference: basicsr/models/srrs_l2s_model.py:32-142)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from os import path as osp

from ..archs.arch_util import resize_bicubic
from ..parallel.mesh import shard_batch
from ..utils.registry import MODEL_REGISTRY
from .srrs_model import SRRSModel


@MODEL_REGISTRY.register()
class L2SSingleModel(SRRSModel):
    """Nested lq/gt dict feed: concatenates RGB + NSS channel groups
    (NSS upsampled x2 to the RGB grid, reference :39-55)."""

    def feed_data(self, data):
        self.batch_meta = {'sample_path': data.get('sample_path'),
                           'img_name': data.get('img_name')}
        lq = np.concatenate([np.asarray(data['lq']['rgb']),
                             np.asarray(data['lq']['nss'])], axis=-1)
        batch = {'lq': lq}
        if 'gt' in data:
            gt_rgb = jnp.asarray(np.asarray(data['gt']['rgb']))
            gt_nss = jnp.asarray(np.asarray(data['gt']['nss']))
            gt_nss_up = resize_bicubic(gt_nss, 2.0)
            batch['gt'] = np.asarray(jnp.concatenate([gt_rgb, gt_nss_up], axis=-1))
        self.batch = shard_batch(batch, self.mesh)

    def _extract_img_name(self, val_data: dict) -> str:
        return val_data['img_name'][0]

    def _save_visuals(self, dataset: str, img_name: str, images: dict):
        """RGB + NSS split saving (reference :82-100)."""
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
