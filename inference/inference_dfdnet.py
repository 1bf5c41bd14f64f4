"""DFDNet face restoration inference (reference: inference/inference_dfdnet.py).

Requires: converted DFDNet weights, the facial-component dictionary, and
per-face part locations (the reference detects these with dlib; pass a
landmarks txt here — dlib is not bundled)."""

import argparse
import os
import sys
from os import path as osp

import cv2
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))
from inference_esrgan import load_params  # noqa: E402


def main():
    import jax.numpy as jnp
    from basicsr4rs_tpu.archs.dfdnet_arch import DFDNet, load_dfdnet_dict

    p = argparse.ArgumentParser()
    p.add_argument('--model_path', required=True)
    p.add_argument('--dict_path', required=True)
    p.add_argument('--input', required=True, help='512x512 aligned face folder')
    p.add_argument('--locations', required=True,
                   help='txt: name x0 y0 x1 y1 (left_eye) ... for 4 parts')
    p.add_argument('--output', default='results/dfdnet')
    args = p.parse_args()

    net = DFDNet(num_feat=64)
    params = load_params(args.model_path, net)
    dictionary = load_dfdnet_dict(args.dict_path)

    locs = {}
    with open(args.locations) as f:
        for line in f:
            parts = line.split()
            if len(parts) == 17:
                locs[parts[0]] = np.asarray([float(v) for v in parts[1:]]).reshape(4, 4)

    os.makedirs(args.output, exist_ok=True)
    for name, boxes in locs.items():
        path = osp.join(args.input, name)
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            print(f'skip {name}')
            continue
        x = img[..., ::-1].astype(np.float32) / 255. * 2 - 1
        part_locations = [boxes[i:i + 1] for i in range(4)]
        out = net.apply({'params': params}, jnp.asarray(x[None]),
                        part_locations, dictionary)
        out = (np.clip((np.asarray(out)[0] + 1) / 2, 0, 1)[..., ::-1] * 255).round()
        cv2.imwrite(osp.join(args.output, name), out.astype(np.uint8))
        print(name)


if __name__ == '__main__':
    main()
