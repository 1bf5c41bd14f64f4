"""Generate a meta_info txt (one `name.png (h,w,c)` line per image)
(reference: scripts/data_preparation/generate_meta_info.py)."""

import argparse
from os import path as osp

import cv2


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--input', required=True, help='image folder')
    p.add_argument('--output', required=True, help='meta_info txt path')
    args = p.parse_args()

    import os
    names = sorted(os.listdir(args.input))
    with open(args.output, 'w') as f:
        for idx, name in enumerate(names):
            img = cv2.imread(osp.join(args.input, name), cv2.IMREAD_UNCHANGED)
            if img is None:
                continue
            if img.ndim == 2:
                h, w, c = *img.shape, 1
            else:
                h, w, c = img.shape
            info = f'{name} ({h},{w},{c})'
            print(idx + 1, info)
            f.write(f'{info}\n')


if __name__ == '__main__':
    main()
