"""DCN roofline + A/B benchmark at EDVR sizes (VERDICT r1 item 7).

The gather-based DCN (ops/dcn.py) issues K*K separate 2x2-patch gathers.
This script measures, on the real chip:

  - fwd and fwd+bwd wall time of the production op at EDVR PCD shapes
  - the analytic roofline: bytes moved (gather traffic dominates) vs the
    matmul FLOPs, so the "% of speed-of-light" is explicit
  - A/B variants: (a) one fused gather with all K*K taps in the index set,
    (b) bf16 contraction

Prints one JSON line. Run on the TPU (default platform).

Usage: python scripts/bench_dcn.py [--n 8] [--h 64] [--c 64] [--dg 8]
"""

import argparse
import functools
import json
import sys
import time
from os import path as osp

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))

V5E_BF16_PEAK = 197e12
V5E_HBM_GBS = 819.0  # v5e HBM bandwidth, GB/s


def timeit(fn, *args, iters=50, warmup=5):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]  # force fetch (axon)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--n', type=int, default=8)
    p.add_argument('--h', type=int, default=64)
    p.add_argument('--c', type=int, default=64)
    p.add_argument('--dg', type=int, default=8)
    p.add_argument('--iters', type=int, default=50)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from basicsr4rs_tpu.ops.dcn import modulated_deform_conv

    n, h, w, c, dg, k = args.n, args.h, args.h, args.c, args.dg, 3
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
    offset = jnp.asarray((rng.rand(n, h, w, 2 * dg * k * k) * 2 - 1).astype(np.float32))
    mask = jnp.asarray(rng.rand(n, h, w, dg * k * k).astype(np.float32))
    weight = jnp.asarray((rng.rand(k, k, c, c) * 0.1).astype(np.float32))

    def make(method):
        fwd = jax.jit(functools.partial(modulated_deform_conv, deform_groups=dg,
                                        method=method))

        def loss(x, offset, mask, weight):
            return jnp.sum(modulated_deform_conv(x, offset, mask, weight,
                                                 deform_groups=dg, method=method) ** 2)

        return fwd, jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))

    fwd_pal, bwd_pal = make('pallas')
    fwd_one, bwd_one = make('onehot')

    # bf16 activations + weights (training compute-policy case)
    x16 = x.astype(jnp.bfloat16)
    w16 = weight.astype(jnp.bfloat16)
    m16 = mask.astype(jnp.bfloat16)

    # numeric agreement of the fused kernel on the real chip (compiled Mosaic,
    # not interpret mode) before timing it
    ref = np.asarray(fwd_one(x, offset, mask, weight))
    got = np.asarray(fwd_pal(x, offset, mask, weight))
    err = float(np.max(np.abs(ref - got)) / (np.abs(ref).max() + 1e-8))

    t_fwd = timeit(fwd_pal, x, offset, mask, weight, iters=args.iters)
    t_bwd = timeit(bwd_pal, x, offset, mask, weight, iters=args.iters)
    t_fwd_onehot = timeit(fwd_one, x, offset, mask, weight, iters=args.iters)
    t_bwd_onehot = timeit(bwd_one, x, offset, mask, weight, iters=max(args.iters // 4, 2))
    t_bf16 = timeit(fwd_pal, x16, offset, m16, w16, iters=args.iters)

    # roofline: gather traffic (K*K gathers x 2x2 patches) + column write/read
    patch_bytes = n * h * w * k * k * 4 * c * 4            # 2x2 patches read
    col_bytes = 2 * n * h * w * k * k * c * 4              # columns write+read
    flops = 2 * n * h * w * k * k * c * c                  # contraction
    t_mem = (patch_bytes + col_bytes) / (V5E_HBM_GBS * 1e9)
    t_mxu = flops / V5E_BF16_PEAK

    result = {
        'metric': 'dcn_fwd_ms',
        'value': round(t_fwd * 1e3, 3),
        'unit': 'ms',
        'shape': f'{n}x{h}x{w}x{c} dg{dg} k{k}',
        'fwd_ms': round(t_fwd * 1e3, 3),
        'fwd_bwd_ms': round(t_bwd * 1e3, 3),
        'fwd_onehot_ms': round(t_fwd_onehot * 1e3, 3),
        'fwd_bwd_onehot_ms': round(t_bwd_onehot * 1e3, 3),
        'fwd_bf16_ms': round(t_bf16 * 1e3, 3),
        'pallas_vs_onehot_rel_err': round(err, 6),
        'roofline_mem_ms': round(t_mem * 1e3, 3),
        'roofline_mxu_ms': round(t_mxu * 1e3, 4),
        'pct_of_mem_roofline': round(100 * t_mem / t_fwd, 1),
        'platform': jax.default_backend(),
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
