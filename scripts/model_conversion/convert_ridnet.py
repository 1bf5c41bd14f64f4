"""Convert the OFFICIAL RIDNet checkpoint (positional parameter order,
different names) into this framework's NHWC Orbax format
(reference analog: scripts/model_conversion/convert_ridnet.py — a purely
positional name assignment over the basicsr RIDNet parameter order).

    python scripts/model_conversion/convert_ridnet.py \
        --input RIDNet_official_original.pt --output converted/ridnet
"""

import argparse
import sys
from os import path as osp

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))
sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

import zoo_remaps  # noqa: E402
from convert_models import load_official  # noqa: E402

# basicsr RIDNet named-parameter order (reference ridnet_arch.py definition
# order — what `RIDNet(3, 64, 3).named_parameters()` yields). The official
# checkpoint's tensors are assigned to these names positionally.
_HEAD = ['sub_mean', 'add_mean', 'head']
_TAIL = ['tail']


def basicsr_ridnet_param_order(num_block: int = 4):
    names = [f'{m}.{p}' for m in _HEAD for p in ('weight', 'bias')]
    for b in range(num_block):
        eam = f'body.{b}'
        seqs = ([f'{eam}.merge.dilation1.0', f'{eam}.merge.dilation1.2',
                 f'{eam}.merge.dilation2.0', f'{eam}.merge.dilation2.2',
                 f'{eam}.merge.aggregation.0',
                 f'{eam}.block1.conv1', f'{eam}.block1.conv2',
                 f'{eam}.block2.body.0', f'{eam}.block2.body.2',
                 f'{eam}.block2.body.4',
                 f'{eam}.ca.attention.1', f'{eam}.ca.attention.3'])
        names += [f'{s}.{p}' for s in seqs for p in ('weight', 'bias')]
    names += [f'{m}.{p}' for m in _TAIL for p in ('weight', 'bias')]
    return names


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--input', required=True)
    p.add_argument('--output', required=True)
    args = p.parse_args()

    state = load_official(args.input)
    remapped = zoo_remaps.remap_ridnet_positional(state, basicsr_ridnet_param_order())
    n = zoo_remaps.save_as_orbax(remapped, 'RIDNet', args.output)
    print(f'converted {n} tensors: {args.input} -> {args.output}')


if __name__ == '__main__':
    main()
