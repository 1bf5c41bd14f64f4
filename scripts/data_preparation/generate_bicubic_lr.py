"""Generate MATLAB-parity bicubic LR (and optional bicubic-restored) images
(replaces the reference MATLAB scripts scripts/matlab_scripts/
generate_bicubic_img.m and generate_LR_Vimeo90K.m — our
``utils.matlab_functions.imresize`` reproduces MATLAB imresize bit-for-bit,
so GT/LR generation no longer needs MATLAB)."""

import argparse
import os
import sys
from os import path as osp

import cv2
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))
from basicsr4rs_tpu.utils.matlab_functions import imresize  # noqa: E402
from basicsr4rs_tpu.utils.misc import scandir  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--input', required=True, help='GT folder (recursed)')
    p.add_argument('--output', required=True, help='LR output folder')
    p.add_argument('--scale', type=int, default=4)
    p.add_argument('--mod', action='store_true',
                   help='also crop GT to a multiple of scale in place of output/GTmod')
    p.add_argument('--bicubic_restore', default=None,
                   help='optional folder for LR upsampled back to GT size')
    args = p.parse_args()

    for rel in sorted(scandir(args.input, recursive=True)):
        img = cv2.imread(osp.join(args.input, rel), cv2.IMREAD_UNCHANGED)
        if img is None:
            continue
        img = img.astype(np.float64) / 255.
        h, w = img.shape[:2]
        img = img[:h - h % args.scale, :w - w % args.scale]
        lr = imresize(img, 1.0 / args.scale)
        out_path = osp.join(args.output, rel)
        os.makedirs(osp.dirname(out_path), exist_ok=True)
        cv2.imwrite(out_path, np.clip(lr * 255, 0, 255).round().astype(np.uint8))
        if args.bicubic_restore:
            bic = imresize(lr, float(args.scale))
            bic_path = osp.join(args.bicubic_restore, rel)
            os.makedirs(osp.dirname(bic_path), exist_ok=True)
            cv2.imwrite(bic_path, np.clip(bic * 255, 0, 255).round().astype(np.uint8))
        print(rel)


if __name__ == '__main__':
    main()
