"""Decompose the EDVR-M train step cost on chip (VERDICT r5 #1: 0.0192 MFU
has no roofline excuse on file). Times, per dtype:

  1. full jitted train step (fwd+bwd+Adam+EMA)    [same as bench_video]
  2. forward-only loss
  3. the 4 PCD DCN sites in isolation (exact EDVR shapes, fwd+bwd)
  4. everything-but-DCN: EDVR with the DCN output replaced by a plain
     3x3 conv of the sampled input (same channel math, no deform sampling)

Prints one JSON line. Usage:
    python scripts/profile_edvr.py [--batch 4] [--frames 5] [--dtype bfloat16]
"""
import argparse
import json
import sys
import time
from os import path as osp

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))


def timeit(fn, args, iters=4, reps=3):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def dcn_sites_ms(batch, frames, dtype, h=64, nf=64, dg=8):
    """The 4 PCD DCN sites at EDVR shapes (batch folded with frames):
    L3 h/4, L2 h/2, L1 h, cascade h."""
    import jax
    import jax.numpy as jnp
    from basicsr4rs_tpu.ops.dcn import modulated_deform_conv
    n = batch * frames
    dt = jnp.bfloat16 if dtype == 'bfloat16' else jnp.float32
    rs = np.random.RandomState(0)
    sites = []
    for hh in (h // 4, h // 2, h, h):
        x = jnp.asarray(rs.rand(n, hh, hh, nf).astype(np.float32)).astype(dt)
        off = jnp.asarray((rs.rand(n, hh, hh, 2 * dg * 9) * 2 - 1).astype(np.float32)).astype(dt)
        msk = jnp.asarray(rs.rand(n, hh, hh, dg * 9).astype(np.float32)).astype(dt)
        w = jnp.asarray((rs.rand(3, 3, nf, nf) * 0.05).astype(np.float32)).astype(dt)
        sites.append((x, off, msk, w))

    def loss(*flat):
        tot = 0.
        for i in range(0, len(flat), 4):
            x, off, msk, w = flat[i:i + 4]
            tot = tot + jnp.sum(modulated_deform_conv(
                x, off, msk, w, deform_groups=dg).astype(jnp.float32) ** 2)
        return tot

    flat = [a for s in sites for a in s]
    bwd = jax.jit(jax.grad(loss, argnums=tuple(range(len(flat)))))
    fwd = jax.jit(loss)
    return timeit(fwd, flat), timeit(bwd, flat)


def model_ms(batch, frames, dtype, no_dcn=False):
    import jax
    import bench  # noqa: F401  (repo root on path via sys.path above)
    sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__))))
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'bench_video', osp.join(osp.dirname(osp.abspath(__file__)), 'bench_video.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    if no_dcn:
        # monkeypatch the DCN to a plain 3x3 conv of x (offset/mask unused):
        # isolates the deformable-sampling cost inside the full step
        from basicsr4rs_tpu.ops import dcn as dcn_mod
        orig = dcn_mod.modulated_deform_conv

        def plain(x, offset, mask, weight, bias=None, stride=1, padding=1,
                  dilation=1, groups=1, deform_groups=1, method='auto'):
            import jax.numpy as jnp
            out = jax.lax.conv_general_dilated(
                x, weight.astype(x.dtype), (stride, stride),
                [(padding, padding)] * 2,
                rhs_dilation=(dilation, dilation),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                feature_group_count=groups)
            # keep offset/mask live so their convs aren't DCE'd
            out = out + (jnp.mean(offset) + jnp.mean(mask)).astype(out.dtype) * 0
            if bias is not None:
                out = out + bias.astype(out.dtype)
            return out

        dcn_mod.modulated_deform_conv = plain
        try:
            r = mod.bench('edvr', batch=batch, frames=frames, lr_size=64,
                          iters=3, dtype=dtype)
        finally:
            dcn_mod.modulated_deform_conv = orig
        return r['step_ms']
    r = mod.bench('edvr', batch=batch, frames=frames, lr_size=64, iters=3,
                  dtype=dtype)
    return r['step_ms']


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=4)
    p.add_argument('--frames', type=int, default=5)
    p.add_argument('--dtype', default='bfloat16', choices=['fp32', 'bfloat16'])
    p.add_argument('--skip-full', action='store_true')
    args = p.parse_args()
    dtype = None if args.dtype == 'fp32' else args.dtype

    from basicsr4rs_tpu.utils.compile_cache import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    out = {'batch': args.batch, 'frames': args.frames, 'dtype': args.dtype}
    dcn_fwd, dcn_bwd = dcn_sites_ms(args.batch, args.frames, args.dtype)
    out['dcn_sites_fwd_ms'] = round(dcn_fwd, 1)
    out['dcn_sites_fwd_bwd_ms'] = round(dcn_bwd, 1)
    print(json.dumps(out), flush=True)  # partial: survive later-stage crashes
    if not args.skip_full:
        out['full_step_ms'] = round(model_ms(args.batch, args.frames, dtype), 1)
        print(json.dumps(out), flush=True)
        out['no_dcn_step_ms'] = round(
            model_ms(args.batch, args.frames, dtype, no_dcn=True), 1)
        out['dcn_share'] = round(
            1 - out['no_dcn_step_ms'] / out['full_step_ms'], 3)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
