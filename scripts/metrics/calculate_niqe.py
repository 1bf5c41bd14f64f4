"""NIQE over a folder (reference: scripts/metrics/calculate_niqe.py)."""

import argparse
import sys
import warnings
from os import path as osp

import cv2
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))
from basicsr4rs_tpu.metrics import calculate_niqe  # noqa: E402
from basicsr4rs_tpu.utils.misc import scandir  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--input', required=True, help='image folder')
    p.add_argument('--crop_border', type=int, default=0)
    args = p.parse_args()

    scores = []
    for i, rel in enumerate(sorted(scandir(args.input, recursive=True))):
        img = cv2.imread(osp.join(args.input, rel), cv2.IMREAD_UNCHANGED)
        with warnings.catch_warnings():
            warnings.simplefilter('ignore', category=RuntimeWarning)
            score = calculate_niqe(img, crop_border=args.crop_border)
        print(f'{i + 1:3d} {osp.basename(rel):25} NIQE: {score:.6f}')
        scores.append(score)
    if scores:
        print(f'Average NIQE: {np.mean(scores):.6f}')


if __name__ == '__main__':
    main()
