"""Crop large images into overlapping sub-images for faster training IO
(reference: scripts/data_preparation/extract_subimages.py — argparse CLI
instead of an edit-me dict).

Example:
    python scripts/data_preparation/extract_subimages.py \
        --input datasets/DIV2K/DIV2K_train_HR \
        --output datasets/DIV2K/DIV2K_train_HR_sub \
        --crop-size 480 --step 240
"""

import argparse
import os
import sys
from multiprocessing import Pool
from os import path as osp

import cv2
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))
from basicsr4rs_tpu.utils.misc import scandir  # noqa: E402


def worker(path, opt):
    crop_size, step, thresh_size = opt.crop_size, opt.step, opt.thresh_size
    img_name, extension = osp.splitext(osp.basename(path))
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    h, w = img.shape[:2]

    h_space = np.arange(0, h - crop_size + 1, step)
    if h - (h_space[-1] + crop_size) > thresh_size:
        h_space = np.append(h_space, h - crop_size)
    w_space = np.arange(0, w - crop_size + 1, step)
    if w - (w_space[-1] + crop_size) > thresh_size:
        w_space = np.append(w_space, w - crop_size)

    index = 0
    for x in h_space:
        for y in w_space:
            index += 1
            cropped = np.ascontiguousarray(img[x:x + crop_size, y:y + crop_size, ...])
            cv2.imwrite(
                osp.join(opt.output, f'{img_name}_s{index:03d}{extension}'), cropped,
                [cv2.IMWRITE_PNG_COMPRESSION, opt.compression_level])
    return f'{img_name}: {index} patches'


def main():
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument('--input', required=True, help='input image folder')
    p.add_argument('--output', required=True, help='output folder for sub-images')
    p.add_argument('--crop-size', type=int, default=480)
    p.add_argument('--step', type=int, default=240)
    p.add_argument('--thresh-size', type=int, default=0,
                   help='drop remainder patches smaller than this')
    p.add_argument('--n-thread', type=int, default=20)
    p.add_argument('--compression-level', type=int, default=3)
    opt = p.parse_args()

    if osp.exists(opt.output):
        print(f'Folder {opt.output} already exists. Exit.')
        sys.exit(1)
    os.makedirs(opt.output)

    img_list = list(scandir(opt.input, full_path=True))
    pool = Pool(opt.n_thread)
    for path in img_list:
        pool.apply_async(worker, args=(path, opt),
                         callback=lambda msg: print(msg, flush=True))
    pool.close()
    pool.join()
    print('All processes done.')


if __name__ == '__main__':
    main()
