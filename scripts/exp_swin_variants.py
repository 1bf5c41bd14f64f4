"""Kernel-variant experiments for the SwinIR attention-branch MFU push
(VERDICT r2 #2). Times the fused branches CHAINED 36x inside one jitted
fori_loop (the SwinIR-M depth) so per-call tunnel dispatch cost vanishes —
matches how the full model consumes the kernels.

Run on the chip: python scripts/exp_swin_variants.py [--iters 8]
"""

import argparse
import json
import sys
import time
from os import path as osp

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))


def timeit(fn, args, iters=8, reps=3):
    out = fn(*args)
    float(np.asarray(out).ravel()[0])
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(np.asarray(out).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--iters', type=int, default=8)
    p.add_argument('--grad', action='store_true')
    p.add_argument('--attn-only', action='store_true')
    p.add_argument('--c', type=int, default=180, help='embed dim (180=SwinIR-M)')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from basicsr4rs_tpu.ops.mlp_block import fused_mlp_block
    from basicsr4rs_tpu.ops.swin_block import fused_swin_attn_block

    B, H, W, C, heads, ws = 8, 64, 64, args.c, 6, 8
    scale = (C // heads) ** -0.5
    rs = np.random.RandomState(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rs.rand(B, H, W, C).astype(np.float32)).astype(dt)
    lns = jnp.ones((C,), jnp.float32)
    lnb = jnp.zeros((C,), jnp.float32)
    wqkv = jnp.asarray(rs.randn(C, 3 * C).astype(np.float32) * 0.05).astype(dt)
    bqkv = jnp.zeros((3 * C,), jnp.float32)
    wproj = jnp.asarray(rs.randn(C, C).astype(np.float32) * 0.05).astype(dt)
    bproj = jnp.zeros((C,), jnp.float32)
    n = ws * ws
    nw = (H // ws) * (W // ws)
    bias1 = jnp.asarray(rs.randn(1, heads, n, n).astype(np.float32) * 0.2)
    biasw = jnp.asarray(rs.randn(nw, heads, n, n).astype(np.float32) * 0.2)
    hidden = 2 * C
    w1 = jnp.asarray(rs.randn(C, hidden).astype(np.float32) * 0.05).astype(dt)
    b1 = jnp.zeros((hidden,), jnp.float32)
    w2 = jnp.asarray(rs.randn(hidden, C).astype(np.float32) * 0.05).astype(dt)
    b2 = jnp.zeros((C,), jnp.float32)

    def chain36(branch):
        @jax.jit
        def run(x):
            h = jax.lax.fori_loop(0, 36, lambda i, v: branch(v), x)
            return jnp.mean(h.astype(jnp.float32))

        if args.grad:
            @jax.jit
            def run(x):  # noqa: F811
                def loss(v):
                    h = jax.lax.fori_loop(0, 36, lambda i, u: branch(u), v)
                    return jnp.mean(h.astype(jnp.float32))
                return jnp.mean(jax.grad(loss)(x).astype(jnp.float32))
        return run

    def attn1(v):
        return fused_swin_attn_block(v, lns, lnb, wqkv, bqkv, wproj, bproj,
                                     bias1, ws, heads, scale, add_residual=True)

    def attnw(v):
        return fused_swin_attn_block(v, lns, lnb, wqkv, bqkv, wproj, bproj,
                                     biasw, ws, heads, scale, add_residual=True)

    def mlp(v):
        return fused_mlp_block(v, lns, lnb, w1, b1, w2, b2, add_residual=True)

    import os
    results = {'knobs': {k: os.environ.get(k) for k in
                         ('SWIN_PACK_CAP', 'SWIN_HEAD_LOOP') if os.environ.get(k)}}
    results['attn36_broadcast_ms'] = round(timeit(chain36(attn1), (x,), args.iters), 2)
    results['attn36_perwindow_ms'] = round(timeit(chain36(attnw), (x,), args.iters), 2)
    if not args.attn_only:
        results['mlp36_ms'] = round(timeit(chain36(mlp), (x,), args.iters), 2)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
