"""SEN2NAIP-style .taco archive dataset
(reference: basicsr/data/taco_dataset.py:14-103). ``tacoreader``/``rasterio``
are optional in this environment — the dataset raises a clear ImportError
when they are missing."""

from __future__ import annotations

import numpy as np

from ..utils.img_util import img2tensor
from ..utils.registry import DATASET_REGISTRY
from .transforms import augment, paired_central_crop, paired_random_crop


@DATASET_REGISTRY.register()
class TacoDataset:
    """Band-index selection, /3000 reflectance scale, [-1, 1] normalization."""

    def __init__(self, opt: dict):
        try:
            import tacoreader  # noqa: F401
            import rasterio  # noqa: F401
        except ImportError as e:
            raise ImportError(
                'TacoDataset requires the optional `tacoreader` and `rasterio` '
                f'packages: {e}')
        import tacoreader
        self.opt = opt
        self.scale = opt['scale']
        self.band_idx = opt['band_idx']
        self.scale_max = 3000
        self.dataset = tacoreader.load(opt['taco_paths'])
        self._rng = np.random.default_rng(opt.get('manual_seed'))

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, idx):
        import rasterio as rio
        sample = self.dataset.read(idx)
        lq_path = sample.read(0)
        gt_path = sample.read(1)

        with rio.open(lq_path) as src, rio.open(gt_path) as dst:
            img_lq = src.read(self.band_idx)
            img_gt = dst.read(self.band_idx)
        img_lq = np.ascontiguousarray(img_lq.transpose(1, 2, 0))
        img_gt = np.ascontiguousarray(img_gt.transpose(1, 2, 0))

        gt_size = self.opt['gt_size']
        if self.opt['phase'] == 'train':
            img_gt, img_lq = paired_random_crop(img_gt, img_lq, gt_size, self.scale,
                                                gt_path, rng=self._rng)
            img_gt, img_lq = augment([img_gt, img_lq], self.opt.get('use_hflip', False),
                                     self.opt.get('use_rot', False), rng=self._rng)
        else:
            img_gt, img_lq = paired_central_crop(img_gt, img_lq, gt_size, self.scale, gt_path)

        img_gt, img_lq = img2tensor([img_gt.astype(np.float32), img_lq.astype(np.float32)],
                                    bgr2rgb=False, float32=True)
        # /3000 then [-1, 1]
        img_lq = (img_lq / self.scale_max) * 2.0 - 1.0
        img_gt = (img_gt / self.scale_max) * 2.0 - 1.0
        return {'lq': img_lq, 'gt': img_gt, 'lq_path': lq_path, 'gt_path': gt_path,
                'band_idx': self.band_idx}


@DATASET_REGISTRY.register()
class TacoSplitDataset:
    """Deterministic split wrapper (reference :87-103, seed 0)."""

    def __init__(self, opt):
        self.opt = opt
        overall = TacoDataset(opt)
        split_percent = opt['split_percent']
        n = len(overall)
        if all(isinstance(p, float) for p in split_percent):
            lengths = [int(np.floor(n * p)) for p in split_percent]
            for i in range(n - sum(lengths)):
                lengths[i % len(lengths)] += 1
        else:
            lengths = list(split_percent)
        perm = np.random.RandomState(0).permutation(n)
        starts = np.cumsum([0] + lengths)
        split = opt['split']
        self.indices = perm[starts[split]:starts[split + 1]]
        self.dataset = overall

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, idx):
        return self.dataset[int(self.indices[idx])]
