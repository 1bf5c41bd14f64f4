"""Dump augmented training batches to PNG for visual inspection
(reference: test_scripts/test_paired_image_dataset.py)."""

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
    p.add_argument('--dataroot_gt', required=True)
    p.add_argument('--dataroot_lq', required=True)
    p.add_argument('--scale', type=int, default=4)
    p.add_argument('--gt_size', type=int, default=128)
    p.add_argument('--num_batches', type=int, default=2)
    p.add_argument('--output', default='tmp_vis')
    args = p.parse_args()

    opt = {
        'name': 'vis', 'type': 'PairedImageDataset', 'phase': 'train',
        'scale': args.scale, 'gt_size': args.gt_size,
        'dataroot_gt': args.dataroot_gt, 'dataroot_lq': args.dataroot_lq,
        'io_backend': {'type': 'disk'}, 'use_hflip': True, 'use_rot': True,
        'batch_size_per_gpu': 4, 'num_worker_per_gpu': 0,
        'dataset_enlarge_ratio': 1,
    }
    ds = build_dataset(opt)
    loader = build_dataloader(ds, opt, num_gpu=0)
    os.makedirs(args.output, exist_ok=True)
    for i, batch in enumerate(loader):
        if i >= args.num_batches:
            break
        for j in range(batch['gt'].shape[0]):
            for key in ('gt', 'lq'):
                img = (np.asarray(batch[key][j])[..., ::-1] * 255).round().astype(np.uint8)
                cv2.imwrite(osp.join(args.output, f'b{i}_{j}_{key}.png'), img)
        print(f'batch {i}: gt {batch["gt"].shape} lq {batch["lq"].shape}')


if __name__ == '__main__':
    main()
