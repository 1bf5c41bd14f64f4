"""Benchmark harness — prints ONE JSON line.

Measures flagship SR inference throughput in output megapixels/sec on the
available accelerator (the driver runs this on one real TPU chip).

Methodology: N forward passes chained inside a single jitted
``lax.fori_loop`` (loop-carried dependency defeats hoisting), one host fetch
at the end. This is required on the remote 'axon' TPU backend where
``block_until_ready`` does not actually wait — only host fetches force
execution.

Workload shape: batch 128 of 96x96 LR tiles (tiled-inference regime). On
v5e the 64-channel convs tile onto the MXU far better with more batch rows
and smaller spatial extent (measured 64.6 vs 27.9 TFLOP/s at equal pixel
count; the upsample tail doubles its throughput below ~128px HR tiles), so
tiled batches are the production serving configuration.

``vs_baseline`` compares against a nominal A100 figure for the same model:
the reference publishes no throughput numbers (BASELINE.md), so we use an
estimated 250 MP/s for torch MSRResNet-x4 fp16 inference on A100 as the
strawman; >1.0 means faster than that estimate.
"""

from __future__ import annotations

import json
import time
from functools import partial

A100_ESTIMATE_MPIX_S = 250.0


def bench_msrresnet_x4(batch: int = 128, lr_size: int = 96, iters: int = 8,
                       dtype: str = 'bfloat16') -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from basicsr4rs_tpu.archs import build_network

    jdt = jnp.bfloat16 if dtype == 'bfloat16' else jnp.float32
    net = build_network({'type': 'MSRResNet', 'num_in_ch': 3, 'num_out_ch': 3,
                         'num_feat': 64, 'num_block': 16, 'upscale': 4, 'dtype': jdt})
    x = jnp.asarray(np.random.RandomState(0).rand(batch, lr_size, lr_size, 3).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x)['params']

    def loop(p, x):
        def body(i, acc):
            y = net.apply({'params': p}, x + acc * 1e-30)
            return acc + jnp.mean(y.astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.))

    fn = jax.jit(loop)
    float(fn(params, x))  # compile + warmup (fetch forces completion)

    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(params, x))
        best = min(best, time.perf_counter() - t0)

    out_pixels = batch * (lr_size * 4) ** 2
    return out_pixels * iters / best / 1e6


if __name__ == '__main__':
    mpix_s = bench_msrresnet_x4()
    print(json.dumps({
        'metric': 'msrresnet_x4_infer_mpix_per_s',
        'value': round(mpix_s, 2),
        'unit': 'MP/s',
        'vs_baseline': round(mpix_s / A100_ESTIMATE_MPIX_S, 3),
    }))
