"""Sweep the video-family train step over per-chip batch and compute dtype
(VERDICT r5 #1: EDVR-M train MFU 0.0192 / BasicVSR++ 0.0287 are ~10x below
the image family; B4/B2 fp32 are torch recipe artifacts, not per-device
optima — the image-family benches already run mixed-precision bf16).

Each configuration runs in a fresh subprocess (clean HBM, persistent
compile cache shared across configs) and reports step_ms + analytic MFU
using the same FLOPs models as bench.py.

    python scripts/sweep_video_train.py [--model edvr|basicvsrpp|both]
        [--batches 4,8,16] [--dtypes fp32,bfloat16] [--timeout 1200]
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
mod = bench._load_script('bench_video.py')
kind, batch, frames, dtype = {kind!r}, {batch}, {frames}, {dtype!r}
r = mod.bench(kind, batch=batch, frames=frames, lr_size=64, iters=3,
              dtype=dtype if dtype != 'fp32' else None)
ms = r['step_ms']
if kind == 'edvr':
    fl = 3 * batch * 64 * 64 * bench.edvr_m_flops_per_lr_pixel_clip(nframes=frames)
else:
    fl = 3 * batch * frames * 64 * 64 * bench.basicvsrpp_flops_per_lr_pixel_frame(t=frames)
r['mfu'] = round(fl / (ms / 1e3) / bench.V5E_BF16_PEAK, 4)
print(json.dumps(r))
'''


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--model', default='both', choices=['edvr', 'basicvsrpp', 'both'])
    p.add_argument('--batches', default=None, help='comma list; default per model')
    p.add_argument('--dtypes', default='fp32,bfloat16')
    p.add_argument('--timeout', type=int, default=1500)
    args = p.parse_args()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    models = ['edvr', 'basicvsrpp'] if args.model == 'both' else [args.model]
    for kind in models:
        frames = 5 if kind == 'edvr' else 7
        default_b = '4,8,16' if kind == 'edvr' else '2,4,8'
        batches = [int(b) for b in (args.batches or default_b).split(',')]
        for dtype in args.dtypes.split(','):
            for batch in batches:
                child = CHILD.format(root=root, kind=kind, batch=batch,
                                     frames=frames, dtype=dtype)
                tag = f'{kind} {dtype} B{batch}'
                try:
                    r = subprocess.run([sys.executable, '-c', child],
                                       capture_output=True, text=True,
                                       cwd=root, timeout=args.timeout)
                except subprocess.TimeoutExpired:
                    print(f'{tag}: TIMEOUT after {args.timeout}s', flush=True)
                    continue
                tail = (r.stdout.strip().splitlines() or ['?'])[-1]
                print(f'{tag}: {tail}', flush=True)
                if r.returncode != 0:
                    print(r.stderr[-600:], flush=True)


if __name__ == '__main__':
    main()
