"""FID of a StyleGAN2 generator checkpoint against dataset statistics
(reference: scripts/metrics/calculate_stylegan2_fid.py)."""

import argparse
import math
import sys
from os import path as osp

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))


def main():
    import jax
    import jax.numpy as jnp
    from basicsr4rs_tpu.archs.stylegan2_arch import StyleGAN2Generator
    from basicsr4rs_tpu.metrics import (calculate_fid, extract_inception_features,
                                        load_patched_inception_v3)
    from basicsr4rs_tpu.metrics.fid import calculate_stats
    from basicsr4rs_tpu.models.base_model import BaseModel

    p = argparse.ArgumentParser()
    p.add_argument('--ckpt', required=True, help='generator checkpoint (orbax dir or torch pth)')
    p.add_argument('--fid_stats', required=True)
    p.add_argument('--out_size', type=int, default=256)
    p.add_argument('--num_sample', type=int, default=50000)
    p.add_argument('--batch_size', type=int, default=64)
    p.add_argument('--inception_weights', default=None)
    args = p.parse_args()

    net = StyleGAN2Generator(out_size=args.out_size)
    if args.ckpt.endswith(('.pth', '.pt')):
        from basicsr4rs_tpu.utils.torch_convert import load_torch_checkpoint
        params = load_torch_checkpoint(args.ckpt, 'params_ema',
                                       rules=StyleGAN2Generator.TORCH_KEY_RULES)
    else:
        params = BaseModel.load_orbax(args.ckpt)['params_ema']

    inception, inc_params = load_patched_inception_v3(args.inception_weights)

    @jax.jit
    def sample(rng):
        z = jax.random.normal(rng, (args.batch_size, 512))
        img, _ = net.apply({'params': params}, [z], rngs={'noise': rng})
        return jnp.clip((img + 1) / 2, 0., 1.)

    def batches():
        key = jax.random.PRNGKey(0)
        for i in range(math.ceil(args.num_sample / args.batch_size)):
            key, sub = jax.random.split(key)
            yield np.asarray(sample(sub))

    feats = extract_inception_features(batches(), inception, inc_params)
    feats = feats[:args.num_sample]
    mu, sigma = calculate_stats(feats)
    stats = np.load(args.fid_stats)
    print(f'fid: {calculate_fid(mu, sigma, stats["mean"], stats["cov"]):.6f}')


if __name__ == '__main__':
    main()
