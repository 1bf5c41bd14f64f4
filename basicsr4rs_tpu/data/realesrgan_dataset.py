"""RealESRGANDataset — GT images + per-item degradation kernels
(reference: basicsr/data/realesrgan_dataset.py:18-193)."""

from __future__ import annotations

import math
import os
import time
from os import path as osp

import cv2
import numpy as np

from ..utils.file_client import FileClient
from ..utils.img_util import imfrombytes, img2tensor
from ..utils.logger import get_root_logger
from ..utils.registry import DATASET_REGISTRY
from .data_util import paired_paths_from_folder, paths_from_folder
from .degradations import circular_lowpass_kernel, random_mixed_kernels
from .transforms import augment, paired_random_crop


@DATASET_REGISTRY.register()
class RealESRGANDataset:
    """GT-only dataset that also samples two blur kernels + a final sinc
    kernel per item (reference realesrgan_dataset.py:79-160). All kernels are
    padded to 21x21 so batches stack."""

    def __init__(self, opt):
        self.opt = opt
        self.file_client = None
        self.io_backend_opt = dict(opt.get('io_backend', {'type': 'disk'}))

        if opt.get('meta_info') is not None:
            with open(opt['meta_info']) as fin:
                paths = [line.strip().split(' ')[0] for line in fin]
            self.paths = [os.path.join(opt['dataroot_gt'], v) for v in paths]
        else:
            self.paths = sorted(paths_from_folder(opt['dataroot_gt']))

        # degradation kernel configs (reference :49-77)
        self.blur_kernel_size = opt['blur_kernel_size']
        self.kernel_list = opt['kernel_list']
        self.kernel_prob = opt['kernel_prob']
        self.blur_sigma = opt['blur_sigma']
        self.betag_range = opt['betag_range']
        self.betap_range = opt['betap_range']
        self.sinc_prob = opt['sinc_prob']

        self.blur_kernel_size2 = opt['blur_kernel_size2']
        self.kernel_list2 = opt['kernel_list2']
        self.kernel_prob2 = opt['kernel_prob2']
        self.blur_sigma2 = opt['blur_sigma2']
        self.betag_range2 = opt['betag_range2']
        self.betap_range2 = opt['betap_range2']

        self.final_sinc_prob = opt['final_sinc_prob']

        self.kernel_range = [2 * v + 1 for v in range(3, 11)]  # 7..21
        self.pulse_tensor = np.zeros((21, 21), np.float32)
        self.pulse_tensor[10, 10] = 1.

        self._rng = np.random.RandomState(opt.get('manual_seed'))

    def _client(self):
        if self.file_client is None:
            backend_opt = dict(self.io_backend_opt)
            self.file_client = FileClient(backend_opt.pop('type'), **backend_opt)
        return self.file_client

    def _sample_kernel(self, kernel_size, sinc_prob, kernel_list, kernel_prob,
                       blur_sigma, betag_range, betap_range):
        if self._rng.uniform() < sinc_prob:
            omega_c = (self._rng.uniform(np.pi / 3, np.pi) if kernel_size < 13
                       else self._rng.uniform(np.pi / 5, np.pi))
            kernel = circular_lowpass_kernel(omega_c, kernel_size, pad_to=False)
        else:
            kernel = random_mixed_kernels(kernel_list, kernel_prob, kernel_size, blur_sigma,
                                          blur_sigma, [-math.pi, math.pi], betag_range,
                                          betap_range, noise_range=None, rng=self._rng)
        pad_size = (21 - kernel_size) // 2
        return np.pad(kernel, ((pad_size, pad_size), (pad_size, pad_size))).astype(np.float32)

    def __getitem__(self, index):
        client = self._client()
        # IO with retry-on-error random substitution (reference :84-110)
        retry = 3
        gt_path = self.paths[index]
        while retry > 0:
            try:
                img_bytes = client.get(gt_path, 'gt')
                break
            except (IOError, OSError) as e:
                logger = get_root_logger()
                logger.warning(f'File client error: {e}, remaining retry times: {retry - 1}')
                index = self._rng.randint(0, len(self.paths))
                gt_path = self.paths[index]
                time.sleep(1)
                retry -= 1
        img_gt = imfrombytes(img_bytes, float32=True)

        # augment + crop/pad to 400 (reference :112-127)
        img_gt = augment(img_gt, self.opt.get('use_hflip', True), self.opt.get('use_rot', True),
                         rng=np.random.default_rng(self._rng.randint(0, 2**31)))
        h, w = img_gt.shape[0:2]
        crop_pad_size = self.opt.get('crop_pad_size', 400)
        if h < crop_pad_size or w < crop_pad_size:
            pad_h = max(0, crop_pad_size - h)
            pad_w = max(0, crop_pad_size - w)
            img_gt = cv2.copyMakeBorder(img_gt, 0, pad_h, 0, pad_w, cv2.BORDER_REFLECT_101)
        if img_gt.shape[0] > crop_pad_size or img_gt.shape[1] > crop_pad_size:
            h, w = img_gt.shape[0:2]
            top = self._rng.randint(0, h - crop_pad_size + 1)
            left = self._rng.randint(0, w - crop_pad_size + 1)
            img_gt = img_gt[top:top + crop_pad_size, left:left + crop_pad_size, ...]

        # two blur kernels (reference :130-152)
        kernel_size = int(self._rng.choice(self.kernel_range))
        kernel = self._sample_kernel(kernel_size, self.opt['sinc_prob'], self.kernel_list,
                                     self.kernel_prob, self.blur_sigma, self.betag_range,
                                     self.betap_range)
        kernel_size = int(self._rng.choice(self.kernel_range))
        kernel2 = self._sample_kernel(kernel_size, self.opt['sinc_prob2'], self.kernel_list2,
                                      self.kernel_prob2, self.blur_sigma2, self.betag_range2,
                                      self.betap_range2)

        # final sinc kernel (reference :154-160)
        if self._rng.uniform() < self.final_sinc_prob:
            kernel_size = int(self._rng.choice(self.kernel_range))
            omega_c = self._rng.uniform(np.pi / 3, np.pi)
            sinc_kernel = circular_lowpass_kernel(omega_c, kernel_size, pad_to=21).astype(np.float32)
        else:
            sinc_kernel = self.pulse_tensor

        img_gt = img2tensor(img_gt, bgr2rgb=True, float32=True)
        return {'gt': img_gt, 'kernel1': kernel, 'kernel2': kernel2,
                'sinc_kernel': sinc_kernel, 'gt_path': gt_path}

    def __len__(self):
        return len(self.paths)


@DATASET_REGISTRY.register()
class RealESRGANPairedDataset:
    """Paired variant for fine-tuning (reference realesrgan_paired_dataset.py:12)."""

    def __init__(self, opt):
        self.opt = opt
        self.file_client = None
        self.io_backend_opt = dict(opt.get('io_backend', {'type': 'disk'}))
        self.mean = opt.get('mean')
        self.std = opt.get('std')
        self.gt_folder, self.lq_folder = opt['dataroot_gt'], opt['dataroot_lq']
        self.filename_tmpl = opt.get('filename_tmpl', '{}')

        if opt.get('meta_info') is not None:
            with open(opt['meta_info']) as fin:
                paths = [line.strip() for line in fin]
            self.paths = []
            for path in paths:
                gt_path, lq_path = path.split(', ')
                self.paths.append({'gt_path': os.path.join(self.gt_folder, gt_path),
                                   'lq_path': os.path.join(self.lq_folder, lq_path)})
        else:
            self.paths = paired_paths_from_folder([self.lq_folder, self.gt_folder],
                                                  ['lq', 'gt'], self.filename_tmpl)
        self._rng = np.random.default_rng(opt.get('manual_seed'))

    def _client(self):
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
            img_gt, img_lq = augment([img_gt, img_lq], self.opt.get('use_hflip', True),
                                     self.opt.get('use_rot', True), rng=self._rng)

        img_gt = img2tensor(img_gt, bgr2rgb=True, float32=True)
        img_lq = img2tensor(img_lq, bgr2rgb=True, float32=True)
        if self.mean is not None or self.std is not None:
            mean = np.asarray(self.mean, dtype=np.float32)
            std = np.asarray(self.std, dtype=np.float32)
            img_lq = (img_lq - mean) / std
            img_gt = (img_gt - mean) / std
        return {'lq': img_lq, 'gt': img_gt, 'lq_path': lq_path, 'gt_path': gt_path}

    def __len__(self):
        return len(self.paths)
