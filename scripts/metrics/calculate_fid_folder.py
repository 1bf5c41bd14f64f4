"""FID between a folder of images and precomputed dataset statistics
(reference: scripts/metrics/calculate_fid_folder.py)."""

import argparse
import sys
from os import path as osp

import cv2
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))
from basicsr4rs_tpu.metrics import (calculate_fid, extract_inception_features,  # noqa: E402
                                    load_patched_inception_v3)
from basicsr4rs_tpu.metrics.fid import calculate_stats  # noqa: E402
from basicsr4rs_tpu.utils.misc import scandir  # noqa: E402


def folder_batches(folder, batch_size, size=299):
    batch = []
    for rel in sorted(scandir(folder, recursive=True)):
        img = cv2.imread(osp.join(folder, rel), cv2.IMREAD_COLOR)
        img = cv2.resize(img, (size, size), interpolation=cv2.INTER_CUBIC)
        batch.append(img[..., ::-1].astype(np.float32) / 255.)  # BGR->RGB, [0,1]
        if len(batch) == batch_size:
            yield np.stack(batch)
            batch = []
    if batch:
        yield np.stack(batch)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--folder', required=True)
    p.add_argument('--fid_stats', required=True, help='npz with mu/sigma of the dataset')
    p.add_argument('--inception_weights', default=None)
    p.add_argument('--batch_size', type=int, default=64)
    args = p.parse_args()

    net, params = load_patched_inception_v3(args.inception_weights)
    feats = extract_inception_features(folder_batches(args.folder, args.batch_size),
                                       net, params)
    mu, sigma = calculate_stats(feats)
    stats = np.load(args.fid_stats)
    fid = calculate_fid(mu, sigma, stats['mean'], stats['cov'])
    print(f'fid: {fid:.6f}')


if __name__ == '__main__':
    main()
