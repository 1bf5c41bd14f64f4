"""ESRGAN/Real-ESRGAN x4 inference over a folder
(reference: inference/inference_esrgan.py).

Example:
    python inference/inference_esrgan.py --model_path ESRGAN_x4.pth \
        --input datasets/lq --output results/esrgan
"""

import argparse
import glob
import os
import sys
from os import path as osp

import cv2
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))


def load_params(model_path, net):
    if model_path.endswith(('.pth', '.pt')):
        from basicsr4rs_tpu.utils.torch_convert import load_torch_checkpoint
        return load_torch_checkpoint(model_path, 'params_ema',
                                     rules=getattr(type(net), 'TORCH_KEY_RULES', None))
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer().restore(osp.abspath(model_path))


def main():
    import jax
    import jax.numpy as jnp
    from basicsr4rs_tpu.archs.rrdbnet_arch import RRDBNet

    p = argparse.ArgumentParser()
    p.add_argument('--model_path', required=True)
    p.add_argument('--input', default='datasets/lq', help='input folder')
    p.add_argument('--output', default='results/esrgan', help='output folder')
    p.add_argument('--num_feat', type=int, default=64)
    p.add_argument('--num_block', type=int, default=23)
    p.add_argument('--tile', type=int, default=0,
                   help='tile size for batched tiled inference (0 = whole image)')
    p.add_argument('--tile_pad', type=int, default=16)
    args = p.parse_args()

    net = RRDBNet(num_in_ch=3, num_out_ch=3, num_feat=args.num_feat,
                  num_block=args.num_block, num_grow_ch=32)
    params = load_params(args.model_path, net)
    apply = jax.jit(lambda x: net.apply({'params': params}, x))
    if args.tile:
        from basicsr4rs_tpu.ops.tile import tiled_apply
        forward = lambda x: tiled_apply(apply, x, 4, args.tile, args.tile_pad)  # noqa: E731
    else:
        forward = apply

    os.makedirs(args.output, exist_ok=True)
    for idx, path in enumerate(sorted(glob.glob(osp.join(args.input, '*')))):
        name = osp.splitext(osp.basename(path))[0]
        print(f'{idx:3d} {name}')
        img = cv2.imread(path, cv2.IMREAD_COLOR).astype(np.float32) / 255.
        x = jnp.asarray(img[None, ..., ::-1])  # BGR->RGB NHWC
        out = np.asarray(forward(x))[0]
        out = (np.clip(out, 0, 1)[..., ::-1] * 255).round().astype(np.uint8)
        cv2.imwrite(osp.join(args.output, f'{name}_ESRGAN.png'), out)


if __name__ == '__main__':
    main()
