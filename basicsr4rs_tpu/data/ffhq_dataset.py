"""FFHQ dataset for StyleGAN2 (reference: basicsr/data/ffhq_dataset.py:13-70)."""

from __future__ import annotations

from os import path as osp

import numpy as np

from ..utils.file_client import FileClient
from ..utils.img_util import imfrombytes, img2tensor
from ..utils.registry import DATASET_REGISTRY
from .data_util import paths_from_lmdb
from .transforms import augment


@DATASET_REGISTRY.register()
class FFHQDataset:
    """1024^2 FFHQ images: hflip + mean/std normalize."""

    def __init__(self, opt):
        self.opt = opt
        self.file_client = None
        self.io_backend_opt = dict(opt.get('io_backend', {'type': 'disk'}))
        self.gt_folder = opt['dataroot_gt']
        self.mean = opt.get('mean', [0.5, 0.5, 0.5])
        self.std = opt.get('std', [0.5, 0.5, 0.5])

        if self.io_backend_opt['type'] == 'lmdb':
            self.io_backend_opt['db_paths'] = self.gt_folder
            self.paths = paths_from_lmdb(self.gt_folder)
        else:
            from ..utils.misc import scandir
            self.paths = sorted(list(scandir(self.gt_folder, full_path=True)))
        self._rng = np.random.default_rng(opt.get('manual_seed'))

    def _client(self):
        if self.file_client is None:
            backend_opt = dict(self.io_backend_opt)
            self.file_client = FileClient(backend_opt.pop('type'), **backend_opt)
        return self.file_client

    def __getitem__(self, index):
        gt_path = self.paths[index]
        img_gt = imfrombytes(self._client().get(gt_path), float32=True)
        img_gt = augment(img_gt, hflip=self.opt.get('use_hflip', True), rotation=False,
                         rng=self._rng)
        img_gt = img2tensor(img_gt, bgr2rgb=True, float32=True)
        mean = np.asarray(self.mean, dtype=np.float32)
        std = np.asarray(self.std, dtype=np.float32)
        img_gt = (img_gt - mean) / std
        return {'gt': img_gt, 'gt_path': gt_path}

    def __len__(self):
        return len(self.paths)
