"""Dump augmented FFHQ training batches to PNG for visual inspection
(reference: test_scripts/test_ffhq_dataset.py). FFHQ samples are normalized
to [-1, 1] (mean/std 0.5), so the writer denormalizes before saving."""

import argparse
import os
import sys
from os import path as osp

import cv2
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))
from basicsr4rs_tpu.data import build_dataloader, build_dataset  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--dataroot_gt', default='datasets/ffhq/ffhq_256.lmdb')
    p.add_argument('--io_backend', default='lmdb', choices=('disk', 'lmdb'))
    p.add_argument('--num_batches', type=int, default=5)
    p.add_argument('--output', default='tmp_vis_ffhq')
    args = p.parse_args()

    opt = {
        'name': 'FFHQ', 'type': 'FFHQDataset', 'phase': 'train', 'scale': 1,
        'dataroot_gt': args.dataroot_gt,
        'io_backend': {'type': args.io_backend},
        'mean': [0.5, 0.5, 0.5], 'std': [0.5, 0.5, 0.5], 'use_hflip': True,
        'batch_size_per_gpu': 4, 'num_worker_per_gpu': 0,
        'dataset_enlarge_ratio': 1,
    }
    ds = build_dataset(opt)
    loader = build_dataloader(ds, opt, num_gpu=0)
    os.makedirs(args.output, exist_ok=True)
    for i, batch in enumerate(loader):
        if i >= args.num_batches:
            break
        gt = np.asarray(batch['gt'])
        print(f'batch {i}: gt {gt.shape} [{gt.min():.3f},{gt.max():.3f}] '
              f'path={batch["gt_path"][0]}')
        for j in range(gt.shape[0]):
            img = np.clip((gt[j] + 1.0) / 2.0, 0, 1)
            cv2.imwrite(osp.join(args.output, f'b{i}_{j}_gt.png'),
                        (img[..., ::-1] * 255).round().astype(np.uint8))


if __name__ == '__main__':
    main()
