"""Capture an xprof trace of the DCN sampler fwd+bwd at EDVR L1 shapes and
print the top device ops by total duration (parsed from the trace-event
JSON — no TensorBoard needed). Diagnoses WHERE the ~110 ms goes after the
r5 probes ruled out MXU rate (bf16==f32), matmul width (row windowing
no-op) and per-cell overhead (DCN_BP 128/256/512 identical).

    python scripts/trace_dcn.py [--dir /tmp/xprof_dcn] [--top 25]
"""
import argparse
import glob
import gzip
import json
import sys
from collections import defaultdict
from os import path as osp

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--dir', default='/tmp/xprof_dcn')
    p.add_argument('--top', type=int, default=25)
    p.add_argument('--batch', type=int, default=4)
    p.add_argument('--frames', type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from basicsr4rs_tpu.ops.dcn import modulated_deform_conv
    from basicsr4rs_tpu.utils.compile_cache import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    n, h, nf, dg = args.batch * args.frames, 64, 64, 8
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(n, h, h, nf).astype(np.float32)).astype(jnp.bfloat16)
    off = jnp.asarray((rs.rand(n, h, h, 2 * dg * 9) * 2 - 1).astype(np.float32))
    msk = jnp.asarray(rs.rand(n, h, h, dg * 9).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray((rs.rand(3, 3, nf, nf) * 0.05).astype(np.float32)).astype(jnp.bfloat16)

    def loss(x, off, msk, w):
        return jnp.sum(modulated_deform_conv(x, off, msk, w,
                                             deform_groups=dg).astype(jnp.float32) ** 2)

    bwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
    out = bwd(x, off, msk, w)
    float(np.asarray(out[0]).ravel()[0])  # compile + force

    jax.profiler.start_trace(args.dir)
    for _ in range(4):
        out = bwd(x, off, msk, w)
    float(np.asarray(out[0]).ravel()[0])
    jax.profiler.stop_trace()

    files = glob.glob(osp.join(args.dir, '**', '*.trace.json.gz'),
                      recursive=True)
    if not files:
        print(json.dumps({'error': 'no trace files', 'dir': args.dir}))
        return
    fn = max(files, key=osp.getmtime)
    with gzip.open(fn, 'rt') as f:
        trace = json.load(f)
    events = trace.get('traceEvents', [])
    # device-lane complete events: sum durations by name
    durs = defaultdict(float)
    counts = defaultdict(int)
    for e in events:
        if e.get('ph') == 'X' and 'dur' in e:
            name = e.get('name', '?')
            durs[name] += e['dur']
            counts[name] += 1
    top = sorted(durs.items(), key=lambda kv: -kv[1])[:args.top]
    total = sum(durs.values())
    print(json.dumps({'trace': fn, 'total_us_all_lanes': round(total, 0)}))
    for name, d in top:
        print(f'{d/1e3:10.2f} ms  x{counts[name]:<5d} {name[:120]}')


if __name__ == '__main__':
    main()
