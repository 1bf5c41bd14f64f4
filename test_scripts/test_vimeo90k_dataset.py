"""Dump augmented Vimeo90K training batches to PNG for visual inspection
(reference: test_scripts/test_vimeo90k_dataset.py)."""

import argparse
import os
import sys
from os import path as osp

import cv2
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))
from basicsr4rs_tpu.data import build_dataloader, build_dataset  # noqa: E402


def save_frames(img, path):
    """img: (t, h, w, c) or (h, w, c) RGB float [0,1] -> horizontal strip PNG."""
    if img.ndim == 3:
        img = img[None]
    strip = np.concatenate(list(img), axis=1)
    cv2.imwrite(path, (strip[..., ::-1] * 255).round().astype(np.uint8))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--dataroot_gt',
                   default='datasets/vimeo90k/vimeo_septuplet/sequences')
    p.add_argument('--dataroot_lq',
                   default='datasets/vimeo90k/vimeo_septuplet_matlabLRx4/sequences')
    p.add_argument('--meta_info_file', required=True)
    p.add_argument('--io_backend', default='disk', choices=('disk', 'lmdb'))
    p.add_argument('--recurrent', action='store_true',
                   help='use Vimeo90KRecurrentDataset')
    p.add_argument('--num_frame', type=int, default=7)
    p.add_argument('--gt_size', type=int, default=256)
    p.add_argument('--num_batches', type=int, default=5)
    p.add_argument('--output', default='tmp_vis_vimeo90k')
    args = p.parse_args()

    opt = {
        'name': 'Vimeo90K', 'phase': 'train', 'scale': 4,
        'type': 'Vimeo90KRecurrentDataset' if args.recurrent else 'Vimeo90KDataset',
        'dataroot_gt': args.dataroot_gt, 'dataroot_lq': args.dataroot_lq,
        'meta_info_file': args.meta_info_file,
        'io_backend': {'type': args.io_backend},
        'num_frame': args.num_frame, 'gt_size': args.gt_size,
        'random_reverse': True, 'use_hflip': True, 'use_rot': True,
        'batch_size_per_gpu': 4, 'num_worker_per_gpu': 0,
        'dataset_enlarge_ratio': 1,
    }
    ds = build_dataset(opt)
    loader = build_dataloader(ds, opt, num_gpu=0)
    os.makedirs(args.output, exist_ok=True)
    for i, batch in enumerate(loader):
        if i >= args.num_batches:
            break
        lq, gt = np.asarray(batch['lq']), np.asarray(batch['gt'])
        print(f'batch {i}: lq {lq.shape} [{lq.min():.3f},{lq.max():.3f}] '
              f'gt {gt.shape} key={batch["key"][0]}')
        for j in range(lq.shape[0]):
            save_frames(lq[j], osp.join(args.output, f'b{i}_{j}_lq.png'))
            save_frames(gt[j], osp.join(args.output, f'b{i}_{j}_gt.png'))


if __name__ == '__main__':
    main()
