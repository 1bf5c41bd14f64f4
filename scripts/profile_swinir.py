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


def _time_grad(fn, params, args_, iters=2, reps=3):
    """Best-of wall time of value_and_grad(fn) w.r.t. params, chained so
    iterations can't overlap or hoist (grad feeds back into params)."""
    import jax
    import jax.numpy as jnp

    def step(p, *a):
        l, g = jax.value_and_grad(fn)(p, *a)
        return jax.tree_util.tree_map(lambda q, d: q - 1e-12 * d.astype(q.dtype),
                                      p, g), l

    def loop(p, *a):
        def body(i, carry):
            p, acc = carry
            p, l = step(p, *a)
            return p, acc + l
        return jax.lax.fori_loop(0, iters, body, (p, jnp.float32(0.)))[1]

    jfn = jax.jit(loop)
    float(jfn(params, *args_))
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jfn(params, *args_))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main_train(B, HW, C, heads, ws, blocks, with_full=True):
    """Backward attribution at the bench train shape (B8 64px, bf16,
    drop_path folded as per-sample scales — the production train path)."""
    import jax
    import jax.numpy as jnp

    rs = np.random.RandomState(0)
    dt = jnp.bfloat16

    t_full = float('nan')
    if with_full:
        from basicsr4rs_tpu.archs import build_network
        net = build_network(dict(
            type='SwinIR', upscale=4, in_chans=3, img_size=64, window_size=8,
            img_range=1., depths=[6] * 6, embed_dim=180, num_heads=[6] * 6,
            mlp_ratio=2, upsampler='pixelshuffle', resi_connection='1conv',
            fused_attn=True, dtype=dt))
        x3 = jnp.asarray(rs.rand(B, HW, HW, 3).astype(np.float32))
        gt = jnp.asarray(rs.rand(B, HW * 4, HW * 4, 3).astype(np.float32))
        params = net.init(jax.random.PRNGKey(0), x3)['params']
        dropkey = jax.random.PRNGKey(1)

        def full_loss(p, xx, g):
            out = net.apply({'params': p}, xx, deterministic=False,
                            rngs={'dropout': dropkey})
            return jnp.mean(jnp.abs(out.astype(jnp.float32) - g))

        t_full = _time_grad(full_loss, params, (x3, gt))

    # ---- attention stack, the REAL train kernel (scaled VJP, s=1)
    from basicsr4rs_tpu.ops.swin_block import fused_swin_attn_block
    x = jnp.asarray(rs.rand(B, HW, HW, C).astype(np.float32)).astype(dt)
    s1 = jnp.ones((B,), jnp.float32)
    bias = jnp.asarray(rs.rand(1, heads, ws * ws, ws * ws).astype(np.float32))
    scale = (C // heads) ** -0.5
    aw = {'lns': jnp.ones((C,), jnp.float32), 'lnb': jnp.zeros((C,), jnp.float32),
          'wqkv': jnp.asarray(rs.rand(C, 3 * C).astype(np.float32) * .05).astype(dt),
          'bqkv': jnp.zeros((3 * C,), dt),
          'wproj': jnp.asarray(rs.rand(C, C).astype(np.float32) * .05).astype(dt),
          'bproj': jnp.zeros((C,), dt)}

    def attn_loss(p, h):
        for _ in range(blocks):
            h = fused_swin_attn_block(h, p['lns'], p['lnb'], p['wqkv'],
                                      p['bqkv'], p['wproj'], p['bproj'], bias,
                                      ws, heads, scale, add_residual=True,
                                      residual_scale=s1)
        return jnp.mean(h.astype(jnp.float32))

    t_attn = _time_grad(attn_loss, aw, (x,))

    # ---- fused MLP stack (the real train kernel, scaled residual)
    from basicsr4rs_tpu.ops.mlp_block import fused_mlp_block
    mw = {'lns': jnp.ones((C,), jnp.float32), 'lnb': jnp.zeros((C,), jnp.float32),
          'w1': jnp.asarray(rs.rand(C, 2 * C).astype(np.float32) * .05).astype(dt),
          'b1': jnp.zeros((2 * C,), jnp.float32),
          'w2': jnp.asarray(rs.rand(2 * C, C).astype(np.float32) * .05).astype(dt),
          'b2': jnp.zeros((C,), jnp.float32)}
    xs = x.reshape(B, HW * HW, C)
    s2 = jnp.ones((B, 1), jnp.float32)

    def mlp_loss(p, h):
        for _ in range(blocks):
            h = fused_mlp_block(h, p['lns'], p['lnb'], p['w1'], p['b1'],
                                p['w2'], p['b2'], add_residual=True,
                                residual_scale=s2)
        return jnp.mean(h.astype(jnp.float32))

    t_mlp = _time_grad(mlp_loss, mw, (xs,))

    # ---- conv path at model sizes
    cw = {'cf': jnp.asarray(rs.rand(3, 3, C, C).astype(np.float32) * .05).astype(dt)}

    def conv_loss(p, h):
        for _ in range(7):
            h = jax.lax.conv_general_dilated(
                h, p['cf'], (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return jnp.mean(h.astype(jnp.float32))

    t_conv = _time_grad(conv_loss, cw, (x,))

    out_mpix = B * (HW * 4) ** 2 / 1e6
    out = {
        'metric': 'swinir_train_breakdown_ms',
        'unit': 'ms/train-step(no-opt)',
        'attn_stack_fwd_bwd_ms': round(t_attn * 1e3, 2),
        'mlp_stack_fwd_bwd_ms': round(t_mlp * 1e3, 2),
        'conv_path_fwd_bwd_ms': round(t_conv * 1e3, 2),
        'platform': jax.default_backend(),
    }
    if t_full == t_full:  # with_full
        out.update(value=round(t_full * 1e3, 2),
                   full_fwd_bwd_ms=round(t_full * 1e3, 2),
                   other_ms=round((t_full - t_attn - t_mlp - t_conv) * 1e3, 2),
                   train_mpix_s=round(out_mpix / t_full, 2))
    print(json.dumps(out))


def main():
    import argparse

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    ap = argparse.ArgumentParser()
    ap.add_argument('--train', action='store_true',
                    help='time fwd+bwd (value_and_grad) per component with '
                         'the REAL train-path kernels (scaled split attn + '
                         'fused MLP), attributing the backward')
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--blocks', type=int, default=36,
                    help='stack depth for the component stacks (the full '
                         'model stays SwinIR-M; shrink for CPU smokes)')
    ap.add_argument('--no-full', action='store_true',
                    help='skip the full-model timing (component stacks only)')
    args = ap.parse_args()

    from basicsr4rs_tpu.utils.compile_cache import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    B, HW, C, heads, ws, blocks = args.batch, 64, 180, 6, 8, args.blocks
    if args.train:
        return main_train(B, HW, C, heads, ws, blocks,
                          with_full=not args.no_full)
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
