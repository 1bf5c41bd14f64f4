"""BasicVSR++ video SR inference (reference: inference/inference_basicvsrpp.py)."""

import argparse
import glob
import os
import sys
from os import path as osp

import cv2
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))
from inference_esrgan import load_params  # noqa: E402


def read_clip(folder):
    frames = []
    for path in sorted(glob.glob(osp.join(folder, '*'))):
        img = cv2.imread(path, cv2.IMREAD_COLOR).astype(np.float32) / 255.
        frames.append(img[..., ::-1])
    return np.stack(frames), [osp.splitext(osp.basename(p))[0]
                              for p in sorted(glob.glob(osp.join(folder, '*')))]


def main():
    import jax
    import jax.numpy as jnp
    from basicsr4rs_tpu.archs.basicvsrpp_arch import BasicVSRPlusPlus

    p = argparse.ArgumentParser()
    p.add_argument('--model_path', required=True)
    p.add_argument('--input', default='datasets/REDS4/000', help='frame folder')
    p.add_argument('--output', default='results/BasicVSRPP')
    p.add_argument('--interval', type=int, default=15, help='frames per chunk')
    args = p.parse_args()

    net = BasicVSRPlusPlus(mid_channels=64, num_blocks=7)
    params = load_params(args.model_path, net)
    apply = jax.jit(lambda x: net.apply({'params': params}, x))

    frames, names = read_clip(args.input)
    os.makedirs(args.output, exist_ok=True)
    for start in range(0, len(frames), args.interval):
        chunk = frames[start:start + args.interval]
        out = np.asarray(apply(jnp.asarray(chunk[None])))[0]
        for img, name in zip(out, names[start:start + args.interval]):
            img = (np.clip(img, 0, 1)[..., ::-1] * 255).round().astype(np.uint8)
            cv2.imwrite(osp.join(args.output, f'{name}_BasicVSRPP.png'), img)
            print(name)


if __name__ == '__main__':
    main()
