"""Convert OFFICIAL-zoo EDSR / RCAN / ESRGAN / EDVR / DUF checkpoints into
this framework's NHWC Orbax format (reference analog:
scripts/model_conversion/convert_models.py — the reference converts
official -> basicsr .pth; we additionally cross the torch->flax boundary).

Example:
    python scripts/model_conversion/convert_models.py --model edsr \
        --input EDSR_x4.pt --output converted/edsr_lx4 --num_block 32

For RIDNet / StyleGAN2 / DFDNet see their dedicated scripts.
"""

import argparse
import functools
import sys
from os import path as osp

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))
sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

import zoo_remaps  # noqa: E402

ARCH_FOR_MODEL = {'edsr': 'EDSR', 'rcan': 'RCAN', 'esrgan': 'RRDBNet',
                  'edvr': 'EDVR', 'duf': 'DUF'}


def load_official(path):
    import torch
    state = torch.load(path, map_location='cpu', weights_only=False)
    for key in ('params', 'params_ema', 'state_dict', 'model'):
        if isinstance(state, dict) and key in state and isinstance(state[key], dict):
            state = state[key]
            break
    return state


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--model', required=True, choices=sorted(ARCH_FOR_MODEL))
    p.add_argument('--input', required=True, help='official checkpoint (.pt/.pth)')
    p.add_argument('--output', required=True, help='output Orbax directory')
    p.add_argument('--num_block', type=int, default=32,
                   help='EDSR residual blocks (32 for L, 16 for M)')
    p.add_argument('--num_group', type=int, default=10, help='RCAN groups')
    p.add_argument('--rcan_num_block', type=int, default=20, help='RCAN blocks/group')
    p.add_argument('--scale', type=int, default=4, help='DUF upscale (channel regroup)')
    args = p.parse_args()

    state = load_official(args.input)
    if args.model == 'edsr':
        key_fn = functools.partial(zoo_remaps.remap_edsr, num_block=args.num_block)
    elif args.model == 'rcan':
        key_fn = functools.partial(zoo_remaps.remap_rcan, num_group=args.num_group,
                                   num_block=args.rcan_num_block)
    elif args.model == 'esrgan':
        key_fn = zoo_remaps.remap_esrgan_rrdb
    elif args.model == 'edvr':
        key_fn = zoo_remaps.remap_edvr
    else:
        key_fn = zoo_remaps.remap_duf_16l

    remapped = zoo_remaps.remap_state_dict(state, key_fn)
    if args.model == 'duf':
        w, b = zoo_remaps.reorder_duf_r2(remapped['conv3d_r2.weight'],
                                         remapped['conv3d_r2.bias'], args.scale)
        remapped['conv3d_r2.weight'], remapped['conv3d_r2.bias'] = w, b

    n = zoo_remaps.save_as_orbax(remapped, ARCH_FOR_MODEL[args.model], args.output)
    print(f'converted {n} tensors: {args.input} -> {args.output}')


if __name__ == '__main__':
    main()
