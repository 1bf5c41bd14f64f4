"""Precompute inception statistics (mu, sigma) for a dataset folder
(reference: scripts/metrics/calculate_fid_stats_from_datasets.py)."""

import argparse
import sys
from os import path as osp

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))
from basicsr4rs_tpu.metrics import extract_inception_features, load_patched_inception_v3  # noqa: E402
from basicsr4rs_tpu.metrics.fid import calculate_stats  # noqa: E402
from calculate_fid_folder import folder_batches  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--folder', required=True)
    p.add_argument('--output', required=True, help='output npz path')
    p.add_argument('--inception_weights', default=None)
    p.add_argument('--batch_size', type=int, default=64)
    p.add_argument('--size', type=int, default=299)
    args = p.parse_args()

    net, params = load_patched_inception_v3(args.inception_weights)
    feats = extract_inception_features(
        folder_batches(args.folder, args.batch_size, args.size), net, params)
    mu, sigma = calculate_stats(feats)
    np.savez(args.output, mean=mu, cov=sigma)
    print(f'saved stats for {feats.shape[0]} images to {args.output}')


if __name__ == '__main__':
    main()
