"""Video test datasets (reference: basicsr/data/video_test_dataset.py:12-283)."""

from __future__ import annotations

from os import path as osp

import numpy as np

from ..utils.img_util import img2tensor
from ..utils.logger import get_root_logger
from ..utils.misc import scandir
from ..utils.registry import DATASET_REGISTRY
from .data_util import duf_downsample, generate_frame_indices, read_img_seq


@DATASET_REGISTRY.register()
class VideoTestDataset:
    """Per-folder frame indexing with border padding (reference :12-131).

    Supports Vid4/REDS4-style folder layouts; ``cache_data`` preloads whole
    folders into memory.
    """

    def __init__(self, opt):
        self.opt = opt
        self.cache_data = opt.get('cache_data', False)
        self.gt_root, self.lq_root = opt['dataroot_gt'], opt['dataroot_lq']
        self.data_info = {'lq_path': [], 'gt_path': [], 'folder': [], 'idx': [], 'border': []}
        assert opt.get('io_backend', {'type': 'disk'})['type'] != 'lmdb', \
            'No need to use lmdb during validation/test.'

        logger = get_root_logger()
        logger.info(f'Generate data info for VideoTestDataset - {opt["name"]}')
        self.imgs_lq, self.imgs_gt = {}, {}
        if opt.get('meta_info_file'):
            with open(opt['meta_info_file'], 'r') as fin:
                subfolders = [line.split(' ')[0] for line in fin]
                subfolders_lq = [osp.join(self.lq_root, key) for key in subfolders]
                subfolders_gt = [osp.join(self.gt_root, key) for key in subfolders]
        else:
            import glob
            subfolders_lq = sorted(d for d in glob.glob(osp.join(self.lq_root, '*')) if osp.isdir(d))
            subfolders_gt = sorted(d for d in glob.glob(osp.join(self.gt_root, '*')) if osp.isdir(d))

        for subfolder_lq, subfolder_gt in zip(subfolders_lq, subfolders_gt):
            subfolder_name = osp.basename(subfolder_lq)
            img_paths_lq = sorted(list(scandir(subfolder_lq, full_path=True)))
            img_paths_gt = sorted(list(scandir(subfolder_gt, full_path=True)))

            max_idx = len(img_paths_lq)
            assert max_idx == len(img_paths_gt), (
                f'Different number of images in lq ({max_idx}) and gt folders ({len(img_paths_gt)})')

            self.data_info['lq_path'].extend(img_paths_lq)
            self.data_info['gt_path'].extend(img_paths_gt)
            self.data_info['folder'].extend([subfolder_name] * max_idx)
            for i in range(max_idx):
                self.data_info['idx'].append(f'{i}/{max_idx}')
            border_l = [0] * max_idx
            for i in range(self.opt['num_frame'] // 2):
                border_l[i] = 1
                border_l[max_idx - i - 1] = 1
            self.data_info['border'].extend(border_l)

            if self.cache_data:
                self.imgs_lq[subfolder_name] = read_img_seq(img_paths_lq)
                self.imgs_gt[subfolder_name] = read_img_seq(img_paths_gt)
            else:
                self.imgs_lq[subfolder_name] = img_paths_lq
                self.imgs_gt[subfolder_name] = img_paths_gt

    def __getitem__(self, index):
        folder = self.data_info['folder'][index]
        idx, max_idx = map(int, self.data_info['idx'][index].split('/'))
        border = self.data_info['border'][index]
        lq_path = self.data_info['lq_path'][index]

        select_idx = generate_frame_indices(idx, max_idx, self.opt['num_frame'],
                                            padding=self.opt.get('padding', 'reflection'))
        if self.cache_data:
            imgs_lq = self.imgs_lq[folder][select_idx]
            img_gt = self.imgs_gt[folder][idx]
        else:
            img_paths_lq = [self.imgs_lq[folder][i] for i in select_idx]
            imgs_lq = read_img_seq(img_paths_lq)
            img_gt = read_img_seq([self.imgs_gt[folder][idx]])[0]

        return {'lq': imgs_lq, 'gt': img_gt, 'folder': folder,
                'idx': self.data_info['idx'][index], 'border': border, 'lq_path': lq_path}

    def __len__(self):
        return len(self.data_info['gt_path'])


@DATASET_REGISTRY.register()
class VideoTestVimeo90KDataset:
    """Vimeo90K-T style test (reference :134-199)."""

    def __init__(self, opt):
        self.opt = opt
        self.cache_data = opt.get('cache_data', False)
        if self.cache_data:
            raise NotImplementedError('cache_data in Vimeo90K-Test dataset is not implemented.')
        self.gt_root, self.lq_root = opt['dataroot_gt'], opt['dataroot_lq']
        self.data_info = {'lq_path': [], 'gt_path': [], 'folder': [], 'idx': [], 'border': []}
        neighbor_list = [i + (9 - opt['num_frame']) // 2 for i in range(opt['num_frame'])]

        with open(opt['meta_info_file'], 'r') as fin:
            subfolders = [line.split(' ')[0] for line in fin]
        for idx, subfolder in enumerate(subfolders):
            gt_path = osp.join(self.gt_root, subfolder, 'im4.png')
            self.data_info['gt_path'].append(gt_path)
            lq_paths = [osp.join(self.lq_root, subfolder, f'im{i}.png') for i in neighbor_list]
            self.data_info['lq_path'].append(lq_paths)
            self.data_info['folder'].append('vimeo90k')
            self.data_info['idx'].append(f'{idx}/{len(subfolders)}')
            self.data_info['border'].append(0)

    def __getitem__(self, index):
        lq_path = self.data_info['lq_path'][index]
        imgs_lq = read_img_seq(lq_path)
        img_gt = read_img_seq([self.data_info['gt_path'][index]])[0]
        return {'lq': imgs_lq, 'gt': img_gt, 'folder': self.data_info['folder'][index],
                'idx': self.data_info['idx'][index], 'border': self.data_info['border'][index],
                'lq_path': lq_path[self.opt['num_frame'] // 2]}

    def __len__(self):
        return len(self.data_info['gt_path'])


@DATASET_REGISTRY.register()
class VideoTestDUFDataset(VideoTestDataset):
    """DUF protocol: LQ synthesized from GT on the fly
    (reference :202-249). ``use_duf_downsampling`` selects Gaussian 13x13 +
    strided sampling of the GT instead of reading bicubic LQ."""

    def __getitem__(self, index):
        folder = self.data_info['folder'][index]
        idx, max_idx = map(int, self.data_info['idx'][index].split('/'))
        border = self.data_info['border'][index]
        lq_path = self.data_info['lq_path'][index]

        select_idx = generate_frame_indices(idx, max_idx, self.opt['num_frame'],
                                            padding=self.opt.get('padding', 'reflection'))
        if self.cache_data:
            if self.opt.get('use_duf_downsampling', False):
                imgs_lq = duf_downsample(self.imgs_gt[folder][select_idx], kernel_size=13,
                                         scale=self.opt['scale'])
            else:
                imgs_lq = self.imgs_lq[folder][select_idx]
            img_gt = self.imgs_gt[folder][idx]
        else:
            if self.opt.get('use_duf_downsampling', False):
                img_paths_gt = [self.imgs_gt[folder][i] for i in select_idx]
                imgs_lq = duf_downsample(read_img_seq(img_paths_gt, require_mod_crop=True,
                                                      scale=self.opt['scale']),
                                         kernel_size=13, scale=self.opt['scale'])
            else:
                img_paths_lq = [self.imgs_lq[folder][i] for i in select_idx]
                imgs_lq = read_img_seq(img_paths_lq)
            img_gt = read_img_seq([self.imgs_gt[folder][idx]], require_mod_crop=True,
                                  scale=self.opt['scale'])[0]

        return {'lq': imgs_lq.astype(np.float32), 'gt': img_gt, 'folder': folder,
                'idx': self.data_info['idx'][index], 'border': border, 'lq_path': lq_path}


@DATASET_REGISTRY.register()
class VideoRecurrentTestDataset(VideoTestDataset):
    """Whole-folder items for recurrent eval (reference :252-283).
    Requires ``cache_data``."""

    def __init__(self, opt):
        super().__init__(opt)
        assert self.cache_data, 'cache_data must be true for VideoRecurrentTestDataset'
        self.folders = sorted(set(self.data_info['folder']))

    def __getitem__(self, index):
        folder = self.folders[index]
        return {'lq': self.imgs_lq[folder], 'gt': self.imgs_gt[folder], 'folder': folder}

    def __len__(self):
        return len(self.folders)
