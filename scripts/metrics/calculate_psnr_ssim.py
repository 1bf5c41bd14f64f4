"""PSNR/SSIM between a restored folder and a GT folder
(reference: scripts/metrics/calculate_psnr_ssim.py)."""

import argparse
import sys
from os import path as osp

import cv2
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))
from basicsr4rs_tpu.metrics import calculate_psnr, calculate_ssim  # noqa: E402
from basicsr4rs_tpu.utils.misc import scandir  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--gt', required=True, help='ground-truth folder')
    p.add_argument('--restored', required=True, help='restored image folder')
    p.add_argument('--crop_border', type=int, default=4)
    p.add_argument('--suffix', default='', help='suffix of restored files vs gt names')
    p.add_argument('--test_y_channel', action='store_true')
    args = p.parse_args()

    psnrs, ssims = [], []
    for i, gt_rel in enumerate(sorted(scandir(args.gt, recursive=True))):
        base = osp.splitext(osp.basename(gt_rel))[0]
        gt = cv2.imread(osp.join(args.gt, gt_rel), cv2.IMREAD_UNCHANGED).astype(np.float64)
        restored_path = osp.join(args.restored, base + args.suffix + '.png')
        restored = cv2.imread(restored_path, cv2.IMREAD_UNCHANGED)
        if restored is None:
            print(f'skip {base}: no restored image at {restored_path}')
            continue
        restored = restored.astype(np.float64)
        psnr = calculate_psnr(restored, gt, crop_border=args.crop_border,
                              test_y_channel=args.test_y_channel)
        ssim = calculate_ssim(restored, gt, crop_border=args.crop_border,
                              test_y_channel=args.test_y_channel)
        print(f'{i + 1:3d} {base:25} PSNR: {psnr:.6f} dB, SSIM: {ssim:.6f}')
        psnrs.append(psnr)
        ssims.append(ssim)
    if psnrs:
        print(f'Average: PSNR: {np.mean(psnrs):.6f} dB, SSIM: {np.mean(ssims):.6f}')


if __name__ == '__main__':
    main()
