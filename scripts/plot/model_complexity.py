"""Model complexity comparison (params / FLOPs / FLOPs-per-output-pixel).

TPU-native analog of the reference's hardcoded plot
(scripts/plot/model_complexity_cmp_bsrn.py): instead of transcribed paper
numbers, FLOPs come from XLA's own cost analysis of the jitted forward, so
any registered arch can be compared at any input size.

Usage:
    python scripts/plot/model_complexity.py --lr-size 64 \
        "MSRResNet:{}" "EDSR:{num_block: 16}" \
        "RRDBNet:{num_feat: 64, num_block: 23, num_grow_ch: 32}" \
        "SwinIR:{embed_dim: 60, depths: [6,6,6,6], num_heads: [6,6,6,6], window_size: 8, upsampler: pixelshuffledirect}"

Each positional arg is "ArchName:{yaml kwargs}". Prints a table; --plot PATH
additionally writes a params-vs-flops scatter (matplotlib, if available).
"""

import argparse
import json
import sys
from os import path as osp

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))


def complexity(arch_opt, lr_size, scale=4):
    import jax
    import jax.numpy as jnp

    from basicsr4rs_tpu.archs import build_network
    net = build_network(arch_opt)
    x = jnp.zeros((1, lr_size, lr_size, 3), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)['params']
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))

    fn = jax.jit(lambda p, x: net.apply({'params': p}, x))
    cost = fn.lower(params, x).compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns a list per computation
        cost = cost[0]
    flops = float(cost.get('flops', float('nan')))
    return n_params, flops


def main():
    p = argparse.ArgumentParser()
    p.add_argument('specs', nargs='+', help='"ArchName:{yaml kwargs}"')
    p.add_argument('--lr-size', type=int, default=64)
    p.add_argument('--scale', type=int, default=4)
    p.add_argument('--plot', default=None, help='write scatter PNG here')
    args = p.parse_args()

    import yaml
    rows = []
    for spec in args.specs:
        name, _, kw = spec.partition(':')
        opt = yaml.safe_load(kw) if kw else {}
        opt = dict(opt or {})
        opt['type'] = name
        n_params, flops = complexity(opt, args.lr_size, args.scale)
        out_pix = (args.lr_size * args.scale) ** 2
        rows.append({'arch': name, 'params_k': round(n_params / 1e3, 1),
                     'gflops': round(flops / 1e9, 2),
                     'kflops_per_out_pix': round(flops / out_pix / 1e3, 2)})
        print(json.dumps(rows[-1]))

    if args.plot:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(8, 6))
        for r in rows:
            ax.scatter(r['params_k'], r['gflops'],
                       s=40 + 4 * r['kflops_per_out_pix'], alpha=0.7)
            ax.annotate(r['arch'], (r['params_k'], r['gflops']),
                        textcoords='offset points', xytext=(6, 4))
        ax.set_xlabel('Parameters (K)')
        ax.set_ylabel(f'GFLOPs @ {args.lr_size}x{args.lr_size} LR')
        ax.set_xscale('log')
        ax.set_yscale('log')
        ax.grid(alpha=0.3)
        fig.tight_layout()
        fig.savefig(args.plot, dpi=120)
        print(f'plot -> {args.plot}')


if __name__ == '__main__':
    main()
