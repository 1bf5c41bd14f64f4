"""StyleGAN2 sampling (reference: inference/inference_stylegan2.py)."""

import argparse
import math
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
    from basicsr4rs_tpu.archs.stylegan2_arch import StyleGAN2Generator

    p = argparse.ArgumentParser()
    p.add_argument('--model_path', required=True)
    p.add_argument('--out_size', type=int, default=1024)
    p.add_argument('--truncation', type=float, default=0.7)
    p.add_argument('--truncation_mean', type=int, default=4096)
    p.add_argument('--sample', type=int, default=1, help='images per batch')
    p.add_argument('--pics', type=int, default=20, help='number of batches')
    p.add_argument('--output', default='samples')
    args = p.parse_args()

    net = StyleGAN2Generator(out_size=args.out_size)
    params = load_params(args.model_path, net)

    key = jax.random.PRNGKey(0)
    if args.truncation < 1:
        z = jax.random.normal(key, (args.truncation_mean, 512))
        mean_latent = None
        # mean latent in W space via the style MLP
        w = net.apply({'params': params}, [z], return_latents=True,
                      rngs={'noise': key})[1]
        mean_latent = jnp.mean(w[:, 0], axis=0)
    else:
        mean_latent = None

    @jax.jit
    def sample(rng):
        z = jax.random.normal(rng, (args.sample, 512))
        img, _ = net.apply({'params': params}, [z], truncation=args.truncation,
                           truncation_latent=mean_latent, rngs={'noise': rng})
        return img

    os.makedirs(args.output, exist_ok=True)
    for i in range(args.pics):
        key, sub = jax.random.split(key)
        imgs = np.asarray(sample(sub))
        for j, img in enumerate(imgs):
            img = (np.clip((img + 1) / 2, 0, 1)[..., ::-1] * 255).round().astype(np.uint8)
            cv2.imwrite(osp.join(args.output, f'{i * args.sample + j:06d}.png'), img)
        print(f'batch {i + 1}/{args.pics}')


if __name__ == '__main__':
    main()
