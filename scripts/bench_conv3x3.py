"""On-chip A/B + numerics check for the fused 3x3 conv kernel
(ops/conv3x3.py) vs XLA's conv at SwinIR-M shapes.

Interpret mode hides Mosaic lowering errors, so the kernel only counts as
verified once this has compiled and matched numerics on the chip
(.claude/skills/verify gotchas). Run alone — concurrent chip processes die
with RESOURCE_EXHAUSTED.

Usage: python scripts/bench_conv3x3.py
"""

import sys
import time

sys.path.insert(0, '.')

import jax
import jax.numpy as jnp
import numpy as np

from basicsr4rs_tpu.ops.conv3x3 import _conv_vjp, _conv_res_vjp, _xla_conv3x3


def _time_chain(fn, args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        o = fn(*args)
        for _ in range(iters - 1):
            o = fn(*args)
        jax.block_until_ready(o)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def case(b, h, w, cin, cout, dtype, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32) * .5).astype(dtype)
    k = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * .05)
    bias = jnp.asarray(.1 * rng.randn(cout).astype(np.float32))
    res = jnp.asarray(rng.randn(b, h, w, cout).astype(np.float32) * .5).astype(dtype)
    return x, k, bias, res


def main():
    shapes = [
        ('swinir_body', 8, 64, 64, 180, 180),
        ('before_up', 8, 64, 64, 180, 64),
        ('upsample0', 8, 64, 64, 64, 256),
        ('upsample1', 8, 128, 128, 64, 256),
    ]
    for name, b, h, w, cin, cout in shapes:
        # respect the public-API VMEM guard (direct _conv_res_vjp calls
        # bypass it and compile-OOM at guard-rejected geometry)
        bpe = 2  # production dtype
        vmem = ((h + 2) * (w + 2) * cin * bpe + h * w * cout * bpe * 2
                + 9 * cin * cout * bpe)
        if vmem > 9e6:
            print(f'{name}: skipped (guard: fused path falls back to XLA)')
            continue
        # numerics in f32 (bf16 matmul noise would mask indexing bugs) at
        # half height — same strip/tap indexing, half the VMEM (f32 at the
        # full shape brushes the 16M scoped-stack limit)
        x, k, bias, res = case(b, h // 2, w, cin, cout, jnp.float32)
        want = np.asarray(jax.jit(
            lambda *a: _xla_conv3x3(*a, act_slope=None))(x, k, bias, res))
        got = np.asarray(jax.jit(
            lambda *a: _conv_res_vjp(None, False, *a))(x, k, bias, res))
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-8)
        # perf in bf16 (the production dtype)
        xb, kb, bb, rb = case(b, h, w, cin, cout, jnp.bfloat16)
        t_xla = _time_chain(jax.jit(
            lambda *a: _xla_conv3x3(*a, act_slope=None)), (xb, kb, bb, rb))
        t_pl = _time_chain(jax.jit(
            lambda *a: _conv_res_vjp(None, False, *a)), (xb, kb, bb, rb))
        gflop = 2 * 9 * cin * cout * h * w * b / 1e9
        print(f'{name}: rel_err={rel:.2e} xla={t_xla:.3f}ms '
              f'pallas={t_pl:.3f}ms speedup={t_xla / t_pl:.2f}x '
              f'pallas_mfu={gflop / t_pl / 197:.3f}')


if __name__ == '__main__':
    main()
