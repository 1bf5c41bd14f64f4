"""SwinIR-M x4 component-time breakdown on the accelerator.

Times, at bench.py shapes (8x64x64, bf16):
  - full model forward
  - the 36-block fused attention+proj stack alone (ops/swin_block.py)
  - a 36-block MLP stack alone (LN2 + fc1 + GELU + fc2 + residual)
  - the conv path alone (conv_first + 6 RSTB tail convs + conv_after_body +
    upsample convs at model sizes)
so the MFU gap (analytic FLOPs / measured) is attributable per component.

Prints one JSON line.
"""

import json
import sys
import time
from os import path as osp

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))


def _time(fn, args, iters=4, reps=3):
    import jax
    import jax.numpy as jnp

    def loop(*a):
        def body(i, acc):
            return acc + fn(acc, *a)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.))

    jfn = jax.jit(loop)
    float(jfn(*args))
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jfn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    B, HW, C, heads, ws, blocks = 8, 64, 180, 6, 8, 36
    rs = np.random.RandomState(0)
    dt = jnp.bfloat16

    # ---- full model
    from basicsr4rs_tpu.archs import build_network
    net = build_network(dict(
        type='SwinIR', upscale=4, in_chans=3, img_size=64, window_size=8,
        img_range=1., depths=[6] * 6, embed_dim=180, num_heads=[6] * 6,
        mlp_ratio=2, upsampler='pixelshuffle', resi_connection='1conv',
        fused_attn=True, dtype=dt))
    x3 = jnp.asarray(rs.rand(B, HW, HW, 3).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x3)['params']
    t_full = _time(lambda acc, p, xx: jnp.mean(
        net.apply({'params': p}, xx + acc * 1e-30).astype(jnp.float32)),
        (params, x3), iters=4)

    # ---- fused attention+proj block stack
    from basicsr4rs_tpu.ops.swin_block import fused_swin_attn_block
    x = jnp.asarray(rs.rand(B, HW, HW, C).astype(np.float32)).astype(dt)
    lns = jnp.ones((C,), jnp.float32)
    lnb = jnp.zeros((C,), jnp.float32)
    wqkv = jnp.asarray(rs.rand(C, 3 * C).astype(np.float32) * 0.05).astype(dt)
    bqkv = jnp.zeros((3 * C,), dt)
    wproj = jnp.asarray(rs.rand(C, C).astype(np.float32) * 0.05).astype(dt)
    bproj = jnp.zeros((C,), dt)
    bias = jnp.asarray(rs.rand(1, heads, ws * ws, ws * ws).astype(np.float32))
    scale = (C // heads) ** -0.5

    def attn_stack(acc, h):
        h = (h + acc * 1e-30).astype(h.dtype)
        for _ in range(blocks):
            h = fused_swin_attn_block(h, lns, lnb, wqkv, bqkv, wproj, bproj,
                                      bias, ws, heads, scale)
        return jnp.mean(h.astype(jnp.float32))

    t_attn = _time(attn_stack, (x,), iters=4)

    # ---- MLP stack (LN2 + fc1 + gelu + fc2 + residual), XLA
    w1 = jnp.asarray(rs.rand(C, 2 * C).astype(np.float32) * 0.05).astype(dt)
    w2 = jnp.asarray(rs.rand(2 * C, C).astype(np.float32) * 0.05).astype(dt)

    def mlp_stack(acc, h):
        h = (h + acc * 1e-30).astype(dt)
        for _ in range(blocks):
            y = nn.LayerNorm(dtype=dt).apply(
                {'params': {'scale': lns, 'bias': lnb}}, h)
            y = jax.nn.gelu(y @ w1) @ w2
            h = h + y
        return jnp.mean(h.astype(jnp.float32))

    t_mlp = _time(mlp_stack, (x,), iters=4)

    # ---- conv path at model sizes
    cf = jnp.asarray(rs.rand(3, 3, C, C).astype(np.float32) * 0.05).astype(dt)

    def conv_stack(acc, h):
        h = (h + acc * 1e-30).astype(dt)
        for _ in range(7):  # 6 RSTB tails + conv_after_body
            h = jax.lax.conv_general_dilated(
                h, cf, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return jnp.mean(h.astype(jnp.float32))

    t_conv = _time(conv_stack, (x,), iters=4)

    out_mpix = B * (HW * 4) ** 2 / 1e6
    result = {
        'metric': 'swinir_breakdown_ms',
        'value': round(t_full * 1e3, 2),
        'unit': 'ms/forward',
        'full_ms': round(t_full * 1e3, 2),
        'attn_stack_ms': round(t_attn * 1e3, 2),
        'mlp_stack_ms': round(t_mlp * 1e3, 2),
        'conv_path_ms': round(t_conv * 1e3, 2),
        'other_ms': round((t_full - t_attn - t_mlp - t_conv) * 1e3, 2),
        'mpix_s': round(out_mpix / t_full, 2),
        'platform': jax.default_backend(),
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
