"""Sweep the Swin kernel knobs against the FULL SwinIR-M train step on chip
(VERDICT r4: swinir_train_mfu >= 0.18). Each configuration runs in a fresh
subprocess because the knobs are read at trace time.

    python scripts/sweep_swin_train.py [--knob SWIN_BWD_CHUNK_MB] [--values 6,8,10,12]
"""
import argparse
import json
import os
import subprocess
import sys

CHILD = r'''
import os, sys, json
sys.path.insert(0, {root!r})
from basicsr4rs_tpu.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import bench
mpix, lrpix = bench.bench_train(bench._swinir_opt(True), batch=8, lr_size=64)
flops = bench.swinir_m_flops_per_lr_pixel()
print(json.dumps({{"mpix_s": round(mpix, 3),
                  "mfu": round(lrpix * flops * 3 / bench.V5E_BF16_PEAK, 4)}}))
'''

DECOMP = r'''
import os, sys, json, time
sys.path.insert(0, {root!r})
from basicsr4rs_tpu.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import jax, jax.numpy as jnp, numpy as np
import bench
net = bench._build(bench._swinir_opt(True))
rs = np.random.RandomState(0)
lq = jnp.asarray(rs.rand(8, 64, 64, 3).astype(np.float32))
gt = jnp.asarray(rs.rand(8, 256, 256, 3).astype(np.float32))
params = net.init(jax.random.PRNGKey(0), lq)['params']
dropkey = jax.random.PRNGKey(1)

def loss(p, x, g):
    out = net.apply({{'params': p}}, x, deterministic=False,
                    rngs={{'dropout': dropkey}})
    return jnp.mean(jnp.abs(out.astype(jnp.float32) - g))

def timeit(fn, reps=4, iters=4):
    jf = jax.jit(fn)
    float(np.asarray(jax.tree_util.tree_leaves(jf(params, lq, gt))[0]).ravel()[0])
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            o = jf(params, lq, gt)
        float(np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3

fwd = timeit(loss)
vg = timeit(lambda p, x, g: jax.value_and_grad(loss)(p, x, g)[0])
print(json.dumps({{"fwd_ms": round(fwd, 2), "fwd_bwd_ms": round(vg, 2),
                  "bwd_ms": round(vg - fwd, 2)}}))
'''


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--knob', default='SWIN_BWD_CHUNK_MB')
    p.add_argument('--values', default='6,8,10,12')
    p.add_argument('--decomp', action='store_true',
                   help='time fwd vs fwd+bwd instead of the full train step')
    p.add_argument('--timeout', type=int, default=1500,
                   help='per-value budget, s (remote compile over the axon '
                        'tunnel can take several minutes cold)')
    args = p.parse_args()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = (DECOMP if args.decomp else CHILD).format(root=root)
    for v in args.values.split(','):
        env = dict(os.environ, **{args.knob: v})
        try:
            r = subprocess.run([sys.executable, '-c', child],
                               capture_output=True, text=True, env=env,
                               cwd=root, timeout=args.timeout)
        except subprocess.TimeoutExpired:
            print(f'{args.knob}={v}: TIMEOUT after {args.timeout}s', flush=True)
            continue
        tail = (r.stdout.strip().splitlines() or ['?'])[-1]
        print(f'{args.knob}={v}: {tail}', flush=True)
        if r.returncode != 0:
            print(r.stderr[-500:], flush=True)


if __name__ == '__main__':
    main()
