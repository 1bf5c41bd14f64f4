"""Convert a reference (torch) checkpoint into this framework's Orbax format
for ANY registered architecture (replaces the reference's per-model
convert_*.py scripts — the rule tables live on the arch classes).

Example:
    python scripts/model_conversion/convert_torch_checkpoint.py \
        --arch MSRResNet --arch_opt '{"upscale": 4}' \
        --input MSRResNetx4.pth --output converted/msrresnet_x4
"""

import argparse
import json
import sys
from os import path as osp

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--arch', required=True, help='registered arch name')
    p.add_argument('--arch_opt', default='{}', help='JSON kwargs for the arch')
    p.add_argument('--input', required=True, help='torch .pth checkpoint')
    p.add_argument('--output', required=True, help='output orbax directory')
    p.add_argument('--param_key', default='params',
                   help='key inside the torch checkpoint (params/params_ema)')
    args = p.parse_args()

    from basicsr4rs_tpu.archs import build_network  # noqa: F401 (registers archs)
    from basicsr4rs_tpu.utils.registry import ARCH_REGISTRY
    from basicsr4rs_tpu.utils.torch_convert import load_torch_checkpoint

    cls = ARCH_REGISTRY.get(args.arch)
    rules = getattr(cls, 'TORCH_KEY_RULES', None)
    net_opt = json.loads(args.arch_opt)
    if rules is None and hasattr(cls(**net_opt) if net_opt else cls, 'torch_key_rules'):
        rules = cls(**net_opt).torch_key_rules
    params = load_torch_checkpoint(args.input, args.param_key, rules=rules)

    import jax
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(osp.abspath(args.output), jax.tree_util.tree_map(lambda x: x, params))
    ckptr.wait_until_finished()
    n = len(jax.tree_util.tree_leaves(params))
    print(f'converted {n} tensors from {args.input} -> {args.output}')


if __name__ == '__main__':
    main()
