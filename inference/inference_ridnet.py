"""RIDNet denoising inference (reference: inference/inference_ridnet.py)."""

import argparse
import glob
import os
import sys
from os import path as osp

import cv2
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))
from inference_esrgan import load_params  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from basicsr4rs_tpu.archs.ridnet_arch import RIDNet

    p = argparse.ArgumentParser()
    p.add_argument('--model_path', required=True)
    p.add_argument('--input', default='datasets/denoise', help='noisy image folder')
    p.add_argument('--output', default='results/ridnet')
    args = p.parse_args()

    net = RIDNet(in_channels=3, mid_channels=64, out_channels=3)
    params = load_params(args.model_path, net)
    apply = jax.jit(lambda x: net.apply({'params': params}, x))

    os.makedirs(args.output, exist_ok=True)
    for idx, path in enumerate(sorted(glob.glob(osp.join(args.input, '*')))):
        name = osp.splitext(osp.basename(path))[0]
        print(f'{idx:3d} {name}')
        img = cv2.imread(path, cv2.IMREAD_COLOR).astype(np.float32) / 255.
        out = np.asarray(apply(jnp.asarray(img[None, ..., ::-1])))[0]
        out = (np.clip(out, 0, 1)[..., ::-1] * 255).round().astype(np.uint8)
        cv2.imwrite(osp.join(args.output, f'{name}_RIDNet.png'), out)


if __name__ == '__main__':
    main()
