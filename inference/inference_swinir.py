"""SwinIR inference with window padding
(reference: inference/inference_swinir.py, task presets included)."""

import argparse
import glob
import os
import sys
from os import path as osp

import cv2
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))
from inference_esrgan import load_params  # noqa: E402

TASKS = {
    'classical_sr': dict(upscale=4, in_chans=3, img_size=48, window_size=8,
                         img_range=1., depths=[6] * 6, embed_dim=180,
                         num_heads=[6] * 6, mlp_ratio=2, upsampler='pixelshuffle'),
    'lightweight_sr': dict(upscale=4, in_chans=3, img_size=64, window_size=8,
                           img_range=1., depths=[6] * 4, embed_dim=60,
                           num_heads=[6] * 4, mlp_ratio=2, upsampler='pixelshuffledirect'),
    'real_sr': dict(upscale=4, in_chans=3, img_size=64, window_size=8,
                    img_range=1., depths=[6] * 6, embed_dim=180,
                    num_heads=[6] * 6, mlp_ratio=2, upsampler='nearest+conv'),
    'gray_dn': dict(upscale=1, in_chans=1, img_size=128, window_size=8,
                    img_range=1., depths=[6] * 6, embed_dim=180,
                    num_heads=[6] * 6, mlp_ratio=2, upsampler=''),
    'color_dn': dict(upscale=1, in_chans=3, img_size=128, window_size=8,
                     img_range=1., depths=[6] * 6, embed_dim=180,
                     num_heads=[6] * 6, mlp_ratio=2, upsampler=''),
    'jpeg_car': dict(upscale=1, in_chans=1, img_size=126, window_size=7,
                     img_range=255., depths=[6] * 6, embed_dim=180,
                     num_heads=[6] * 6, mlp_ratio=2, upsampler=''),
}


def main():
    import jax
    import jax.numpy as jnp
    from basicsr4rs_tpu.archs.swinir_arch import SwinIR
    from basicsr4rs_tpu.models.swinir_model import pad_to_multiple

    p = argparse.ArgumentParser()
    p.add_argument('--model_path', required=True)
    p.add_argument('--task', choices=sorted(TASKS), default='classical_sr')
    p.add_argument('--scale', type=int, default=None, help='override task upscale')
    p.add_argument('--input', default='datasets/lq')
    p.add_argument('--output', default='results/swinir')
    p.add_argument('--tile', type=int, default=0,
                   help='tile size for batched tiled inference on huge '
                        'inputs (0 = whole image; rounded up to the window '
                        'multiple). Tiles run as ONE device batch.')
    p.add_argument('--tile_pad', type=int, default=32,
                   help='halo around each tile core (input pixels)')
    args = p.parse_args()

    kwargs = dict(TASKS[args.task])
    if args.scale is not None:
        kwargs['upscale'] = args.scale
    net = SwinIR(**kwargs)
    params = load_params(args.model_path, net)
    apply = jax.jit(lambda x: net.apply({'params': params}, x))
    scale, window = kwargs['upscale'], kwargs['window_size']
    if args.tile:
        from basicsr4rs_tpu.ops.tile import tiled_apply
        # tile geometry must keep every padded tile a window multiple
        tile = -(-args.tile // window) * window
        pad = -(-args.tile_pad // window) * window
        base_apply = apply
        apply = lambda x: tiled_apply(base_apply, x, scale, tile, pad)  # noqa: E731
    gray = kwargs['in_chans'] == 1

    os.makedirs(args.output, exist_ok=True)
    for idx, path in enumerate(sorted(glob.glob(osp.join(args.input, '*')))):
        name = osp.splitext(osp.basename(path))[0]
        print(f'{idx:3d} {name}')
        flag = cv2.IMREAD_GRAYSCALE if gray else cv2.IMREAD_COLOR
        img = cv2.imread(path, flag).astype(np.float32) / 255.
        if gray:
            img = img[..., None]
        else:
            img = img[..., ::-1]
        x = jnp.asarray(img[None])
        h, w = x.shape[1:3]
        out = np.asarray(apply(pad_to_multiple(x, window)))
        out = out[0, :h * scale, :w * scale]
        out = np.clip(out, 0, 1)
        out = (out[..., ::-1] if not gray else out[..., 0])
        cv2.imwrite(osp.join(args.output, f'{name}_SwinIR.png'),
                    (out * 255).round().astype(np.uint8))


if __name__ == '__main__':
    main()
