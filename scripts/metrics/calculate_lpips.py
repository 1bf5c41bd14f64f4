"""LPIPS between restored and GT folders
(reference: scripts/metrics/calculate_lpips.py)."""

import argparse
import sys
from os import path as osp

import cv2
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))
from basicsr4rs_tpu.metrics.lpips import LPIPS, load_lpips_weights  # noqa: E402
from basicsr4rs_tpu.utils.misc import scandir  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    p = argparse.ArgumentParser()
    p.add_argument('--gt', required=True)
    p.add_argument('--restored', required=True)
    p.add_argument('--suffix', default='')
    p.add_argument('--alexnet_weights', default=None)
    p.add_argument('--lin_weights', default=None)
    args = p.parse_args()

    params = load_lpips_weights(args.alexnet_weights, args.lin_weights)
    net = LPIPS()
    fn = jax.jit(lambda a, b: net.apply({'params': params}, a, b))

    scores = []
    for i, rel in enumerate(sorted(scandir(args.gt, recursive=True))):
        base = osp.splitext(osp.basename(rel))[0]
        gt = cv2.imread(osp.join(args.gt, rel), cv2.IMREAD_COLOR)
        restored = cv2.imread(osp.join(args.restored, base + args.suffix + '.png'),
                              cv2.IMREAD_COLOR)
        if restored is None:
            continue
        to_rgb11 = lambda im: im[..., ::-1].astype(np.float32) / 255. * 2 - 1  # noqa: E731
        score = float(fn(jnp.asarray(to_rgb11(gt)[None]),
                         jnp.asarray(to_rgb11(restored)[None]))[0])
        print(f'{i + 1:3d} {base:25} LPIPS: {score:.6f}')
        scores.append(score)
    if scores:
        print(f'Average LPIPS: {np.mean(scores):.6f}')


if __name__ == '__main__':
    main()
