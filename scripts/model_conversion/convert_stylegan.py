"""Convert official stylegan2-pytorch (rosinality) FFHQ weights into this
framework's NHWC Orbax format (reference analog:
scripts/model_conversion/convert_stylegan.py).

The official file holds {'g_ema', 'g', 'd', 'latent_avg'}; we convert the
EMA generator and the discriminator.

    python scripts/model_conversion/convert_stylegan.py \
        --input stylegan2-ffhq.pth --output_g converted/stylegan2_g \
        --output_d converted/stylegan2_d
"""

import argparse
import sys
from os import path as osp

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))
sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

import zoo_remaps  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--input', required=True)
    p.add_argument('--output_g', required=True)
    p.add_argument('--output_d', default=None)
    args = p.parse_args()

    import torch
    blob = torch.load(args.input, map_location='cpu', weights_only=False)

    g_src = blob.get('g_ema', blob.get('g', blob))
    g = zoo_remaps.remap_state_dict(
        g_src, lambda k: zoo_remaps.remap_stylegan2_g(k, tuple(g_src[k].shape)))
    n = zoo_remaps.save_as_orbax(g, 'StyleGAN2Generator', args.output_g)
    print(f'generator: converted {n} tensors -> {args.output_g}')

    if args.output_d and 'd' in blob:
        d = zoo_remaps.remap_state_dict(blob['d'], zoo_remaps.remap_stylegan2_d)
        n = zoo_remaps.save_as_orbax(d, 'StyleGAN2Discriminator', args.output_d)
        print(f'discriminator: converted {n} tensors -> {args.output_d}')


if __name__ == '__main__':
    main()
