"""Decompose the Real-ESRGAN degradation-synthesis program cost
(VERDICT r2 #8: the synthesis program costs more than the model step —
269 ms vs 218 ms at B12x256 GT on v5e).

Times each synthesis component chained inside one jitted fori_loop (so the
axon per-call dispatch floor vanishes) at the true pipeline shapes, plus
A/B formulation candidates for the dominant ones.

Run on the chip: python scripts/profile_degradation.py [--batch 12] [--gt 256]
"""

import argparse
import json
import sys
import time
from os import path as osp

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))


def timeit_chain(fn, x, iters=20, reps=3):
    """Time fn chained `iters`x inside one jit (shape-preserving fn)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(v):
        out = jax.lax.fori_loop(0, iters, lambda i, u: fn(u), v)
        return jnp.mean(out.astype(jnp.float32))

    float(run(x))
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(x)
        float(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=12)
    p.add_argument('--gt', type=int, default=256)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from basicsr4rs_tpu.utils.diffjpeg import DiffJPEG
    from basicsr4rs_tpu.utils.img_process_util import USMSharp, filter2D

    n, gt_size = args.batch, args.gt
    canvas1 = int(np.ceil(gt_size * 1.5))
    lq = gt_size // 4
    rs = np.random.RandomState(0)
    img_gt = jnp.asarray(rs.rand(n, gt_size, gt_size, 3).astype(np.float32))
    img_c1 = jnp.asarray(rs.rand(n, canvas1, canvas1, 3).astype(np.float32))
    img_lq = jnp.asarray(rs.rand(n, lq, lq, 3).astype(np.float32))
    kernels = jnp.asarray(rs.rand(n, 21, 21).astype(np.float32))
    kernels = kernels / kernels.sum(axis=(1, 2), keepdims=True)

    usm = USMSharp()
    jpeger = DiffJPEG(differentiable=False)
    q = jnp.full((n,), 70.0)

    results = {}
    results['usm_gt_ms'] = round(timeit_chain(lambda v: usm(v), img_gt), 2)
    results['filter2d21_canvas_ms'] = round(
        timeit_chain(lambda v: filter2D(v, kernels), img_c1), 2)
    results['filter2d21_gt_ms'] = round(
        timeit_chain(lambda v: filter2D(v, kernels), img_gt), 2)
    results['jpeg_canvas_ms'] = round(
        timeit_chain(lambda v: jpeger(jnp.clip(v, 0, 1), q), img_c1), 2)
    results['jpeg_lq_ms'] = round(
        timeit_chain(lambda v: jpeger(jnp.clip(v, 0, 1), q), img_lq), 2)

    def resize_like_stage1(v):
        scale = jnp.float32(0.7)
        out = jax.image.scale_and_translate(
            v, v.shape, (1, 2), jnp.stack([scale, scale]),
            jnp.zeros((2,), jnp.float32), method='linear', antialias=True)
        return out

    results['resize_aa_canvas_ms'] = round(timeit_chain(resize_like_stage1, img_c1), 2)

    def noise_g(v):
        return v + 0.01 * jax.random.normal(jax.random.PRNGKey(0), v.shape, v.dtype)

    results['gauss_noise_canvas_ms'] = round(timeit_chain(noise_g, img_c1), 2)

    from basicsr4rs_tpu.data.degradations import (random_add_gaussian_noise_jax,
                                                  random_add_poisson_noise_jax)

    def noise_gauss_full(v):
        return random_add_gaussian_noise_jax(jax.random.PRNGKey(0), v, [1, 30],
                                             0.4, clip=True)

    def noise_poisson_full(v):
        return random_add_poisson_noise_jax(jax.random.PRNGKey(0), v, [0.05, 3],
                                            0.4, clip=True)

    results['gauss_full_canvas_ms'] = round(timeit_chain(noise_gauss_full, img_c1), 2)
    results['poisson_full_canvas_ms'] = round(timeit_chain(noise_poisson_full, img_c1), 2)

    # ---- full program (for the headline number)
    from basicsr4rs_tpu.ops.degradation_pipeline import RealESRGANDegrader
    opt = {
        'scale': 4,
        'resize_prob': [0.2, 0.7, 0.1], 'resize_range': [0.15, 1.5],
        'gaussian_noise_prob': 0.5, 'noise_range': [1, 30],
        'poisson_scale_range': [0.05, 3], 'gray_noise_prob': 0.4,
        'jpeg_range': [30, 95],
        'second_blur_prob': 0.8,
        'resize_prob2': [0.3, 0.4, 0.3], 'resize_range2': [0.3, 1.2],
        'gaussian_noise_prob2': 0.5, 'noise_range2': [1, 25],
        'poisson_scale_range2': [0.05, 2.5], 'gray_noise_prob2': 0.4,
        'jpeg_range2': [30, 95],
    }
    degrader = RealESRGANDegrader(opt)
    sinc = jnp.asarray(rs.rand(n, 21, 21).astype(np.float32))
    sinc = sinc / sinc.sum(axis=(1, 2), keepdims=True)

    @jax.jit
    def synth(key, gt):
        lq_img, gt_out, gt_usm = degrader(key, gt, kernels, kernels, sinc)
        return jnp.mean(lq_img) + jnp.mean(gt_usm)

    key = jax.random.PRNGKey(0)
    float(synth(key, img_gt))
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(8):
            out = synth(jax.random.fold_in(key, i), img_gt)
        float(out)
        best = min(best, (time.perf_counter() - t0) / 8)
    results['full_synth_ms'] = round(best * 1e3, 2)

    print(json.dumps(results))


if __name__ == '__main__':
    main()
