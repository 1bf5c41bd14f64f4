"""Fold REDS val clips into the training set as clips 240-269
(reference: scripts/data_preparation/regroup_reds_dataset.py)."""

import argparse
import glob
import os
import shutil
from os import path as osp


def regroup(train_folder, val_folder):
    for folder in sorted(glob.glob(osp.join(val_folder, '*'))):
        index = int(osp.basename(folder))
        new_folder_idx = index + 240
        dst = osp.join(train_folder, f'{new_folder_idx:03d}')
        os.makedirs(dst, exist_ok=True)
        for img_path in sorted(glob.glob(osp.join(folder, '*'))):
            shutil.copy(img_path, osp.join(dst, osp.basename(img_path)))
        print(f'{folder} -> {dst}')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--train-sharp', default='datasets/REDS/train_sharp')
    p.add_argument('--val-sharp', default='datasets/REDS/val_sharp')
    p.add_argument('--train-blur', default=None)
    p.add_argument('--val-blur', default=None)
    args = p.parse_args()
    regroup(args.train_sharp, args.val_sharp)
    if args.train_blur and args.val_blur:
        regroup(args.train_blur, args.val_blur)


if __name__ == '__main__':
    main()
