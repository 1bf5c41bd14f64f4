"""Convert the official DFDNet checkpoint into this framework's NHWC Orbax
format (reference analog: scripts/model_conversion/convert_dfdnet.py).

    python scripts/model_conversion/convert_dfdnet.py \
        --input DFDNet_official_original.pth --output converted/dfdnet
"""

import argparse
import sys
from os import path as osp

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))
sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

import zoo_remaps  # noqa: E402
from convert_models import load_official  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--input', required=True)
    p.add_argument('--output', required=True)
    args = p.parse_args()

    state = load_official(args.input)
    remapped = zoo_remaps.remap_state_dict(state, zoo_remaps.remap_dfdnet)
    n = zoo_remaps.save_as_orbax(remapped, 'DFDNet', args.output)
    print(f'converted {n} tensors: {args.input} -> {args.output}')


if __name__ == '__main__':
    main()
