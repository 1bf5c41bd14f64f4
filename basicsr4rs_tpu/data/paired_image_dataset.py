"""Paired LQ/GT image dataset (reference: basicsr/data/paired_image_dataset.py:11-107)."""

from __future__ import annotations

import numpy as np

from ..utils.color_util import bgr2ycbcr
from ..utils.file_client import FileClient
from ..utils.img_util import imfrombytes, img2tensor
from ..utils.registry import DATASET_REGISTRY
from .data_util import (paired_paths_from_folder, paired_paths_from_lmdb,
                        paired_paths_from_meta_info_file)
from .transforms import augment, paired_random_crop


@DATASET_REGISTRY.register()
class PairedImageDataset:
    """LQ/GT pairs from lmdb / meta-info file / folder scan.

    Three modes (reference paired_image_dataset.py:53-61):
      1. lmdb: both roots end in .lmdb
      2. meta_info_file: GT names + filename_tmpl
      3. folder: scan both dirs

    Train phase: ``paired_random_crop`` + flip/rot augmentation; val/test: GT
    is returned full-size (callers mod-crop). Returns HWC float32 RGB arrays
    in [0, 1] under keys ``lq``/``gt`` (NHWC after collate).
    """

    def __init__(self, opt):
        self.opt = opt
        self.file_client = None
        self.io_backend_opt = dict(opt.get('io_backend', {'type': 'disk'}))
        self.mean = opt.get('mean')
        self.std = opt.get('std')

        self.gt_folder, self.lq_folder = opt['dataroot_gt'], opt['dataroot_lq']
        self.filename_tmpl = opt.get('filename_tmpl', '{}')

        if self.io_backend_opt['type'] == 'lmdb':
            self.io_backend_opt['db_paths'] = [self.lq_folder, self.gt_folder]
            self.io_backend_opt['client_keys'] = ['lq', 'gt']
            self.paths = paired_paths_from_lmdb([self.lq_folder, self.gt_folder], ['lq', 'gt'])
        elif opt.get('meta_info_file') is not None:
            self.paths = paired_paths_from_meta_info_file(
                [self.lq_folder, self.gt_folder], ['lq', 'gt'], opt['meta_info_file'], self.filename_tmpl)
        else:
            self.paths = paired_paths_from_folder(
                [self.lq_folder, self.gt_folder], ['lq', 'gt'], self.filename_tmpl)

        # Per-item RNG stream: deterministic given manual_seed + item ordinal.
        self._rng = np.random.default_rng(opt.get('manual_seed'))

    def _client(self) -> FileClient:
        if self.file_client is None:
            backend_opt = dict(self.io_backend_opt)
            self.file_client = FileClient(backend_opt.pop('type'), **backend_opt)
        return self.file_client

    def __getitem__(self, index):
        client = self._client()
        scale = self.opt['scale']

        gt_path = self.paths[index]['gt_path']
        img_gt = imfrombytes(client.get(gt_path, 'gt'), float32=True)
        lq_path = self.paths[index]['lq_path']
        img_lq = imfrombytes(client.get(lq_path, 'lq'), float32=True)

        if self.opt['phase'] == 'train':
            gt_size = self.opt['gt_size']
            img_gt, img_lq = paired_random_crop(img_gt, img_lq, gt_size, scale, gt_path, rng=self._rng)
            img_gt, img_lq = augment([img_gt, img_lq], self.opt.get('use_hflip', False),
                                     self.opt.get('use_rot', False), rng=self._rng)

        # Y-channel training/eval (reference :71-75).
        if self.opt.get('color') == 'y':
            img_gt = bgr2ycbcr(img_gt, y_only=True)[..., None]
            img_lq = bgr2ycbcr(img_lq, y_only=True)[..., None]

        # Crop GT to match LQ for consistency in val (reference :79-81).
        if self.opt['phase'] != 'train':
            img_gt = img_gt[0:img_lq.shape[0] * scale, 0:img_lq.shape[1] * scale, :]

        img_gt = img2tensor(img_gt, bgr2rgb=self.opt.get('color') != 'y', float32=True)
        img_lq = img2tensor(img_lq, bgr2rgb=self.opt.get('color') != 'y', float32=True)

        if self.mean is not None or self.std is not None:
            mean = np.asarray(self.mean, dtype=np.float32)
            std = np.asarray(self.std, dtype=np.float32)
            img_lq = (img_lq - mean) / std
            img_gt = (img_gt - mean) / std

        return {'lq': img_lq, 'gt': img_gt, 'lq_path': lq_path, 'gt_path': gt_path}

    def __len__(self):
        return len(self.paths)
