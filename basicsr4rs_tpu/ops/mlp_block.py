"""Fused LayerNorm + MLP branch kernel: LN2 -> fc1 -> GELU -> fc2 in ONE
Pallas call.

Motivation (measured on v5e, SwinIR-M x4, batch 8x64x64): the XLA MLP stack
runs at ~18% MFU because the LN statistics, the (T, 2C) hidden activation
and the GELU all round-trip HBM between the two GEMMs. Fused, the branch
touches HBM only for x in and the branch output (both C wide, ~4x less
traffic) and the hidden stays in VMEM.

The residual add and DropPath stay OUTSIDE (the caller owns them), so the
kernel computes exactly ``fc2(gelu(fc1(LN(x))))`` — the transformer MLP
branch (reference swinir_arch.py Mlp, :61-77).

Backward is one Pallas kernel that recomputes LN/fc1/GELU flash-style (only
x is saved) and emits gradients for x, the LN affine and both GEMMs. Weight
gradients accumulate in constant-index f32 blocks over a (token-tile,)
grid (single grid axis — every revisit is on the minormost dim).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_LN_EPS = 1e-5


def reference_mlp_block(x, ln_scale, ln_bias, w1, b1, w2, b2):
    """Pure-XLA branch (non-TPU fallback; autodiff provides the backward).
    x: (..., C); returns fc2(gelu(fc1(LN(x)))), same shape/dtype."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu)
    xn = (xf - mu) * jax.lax.rsqrt(var + _LN_EPS)
    xn = xn * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    h = (xn.astype(dt) @ w1.astype(dt)).astype(jnp.float32) + b1.astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=False)
    z = (h.astype(dt) @ w2.astype(dt)).astype(jnp.float32) + b2.astype(jnp.float32)
    return z.astype(dt)


def _ln_forward(xf, ln_scale, ln_bias):
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    inv = jax.lax.rsqrt(var + _LN_EPS)
    return (xf - mu) * inv * ln_scale + ln_bias, mu, inv


def _erf(x):
    """Abramowitz–Stegun 7.1.26 rational erf (max abs err 1.5e-7 — far below
    bf16 rounding): Mosaic implements neither erf nor erfc."""
    a1, a2, a3, a4, a5 = 0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    ax = jnp.abs(x)
    t = 1. / (1. + 0.3275911 * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return jnp.sign(x) * (1. - poly * jnp.exp(-ax * ax))


def _gelu(h):
    """Exact (erf) gelu, matching jax.nn.gelu(approximate=False) to 1.5e-7."""
    return 0.5 * h * (1. + _erf(h * jnp.float32(0.7071067811865476)))


def _gelu_grad(h):
    """d gelu(h) / dh for exact (erf) gelu, f32."""
    cdf = 0.5 * (1. + _erf(h * jnp.float32(0.7071067811865476)))
    pdf = jnp.exp(-0.5 * h * h) * jnp.float32(0.3989422804014327)
    return cdf + h * pdf


def _mlp_fwd_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                    *rest, add_residual, scaled=False):
    # scaled=True appends a per-token (tile, 1) residual scale s (DropPath
    # mask/keep folded into the kernel): out = s*branch + x
    if scaled:
        s_ref, out_ref = rest
    else:
        out_ref, = rest
    dt = x_ref.dtype
    xf = x_ref[...].astype(jnp.float32)
    xn, _, _ = _ln_forward(xf, lns_ref[0], lnb_ref[0])
    h = jax.lax.dot(xn.astype(dt), w1_ref[...],
                    preferred_element_type=jnp.float32) + b1_ref[0]
    h = _gelu(h)
    z = jax.lax.dot(h.astype(dt), w2_ref[...],
                    preferred_element_type=jnp.float32) + b2_ref[0]
    if scaled:
        z = z * s_ref[...].astype(jnp.float32) + xf
    elif add_residual:
        z = z + xf
    out_ref[...] = z.astype(out_ref.dtype)


def _mlp_bwd_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, dz_ref,
                    *rest, add_residual, scaled=False):
    from jax.experimental import pallas as pl

    if scaled:
        (s_ref, dx_ref, dlns_ref, dlnb_ref, dw1_ref, db1_ref, dw2_ref,
         db2_ref) = rest
    else:
        (dx_ref, dlns_ref, dlnb_ref, dw1_ref, db1_ref, dw2_ref,
         db2_ref) = rest
    dt = x_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dlns_ref[...] = jnp.zeros_like(dlns_ref)
        dlnb_ref[...] = jnp.zeros_like(dlnb_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    # recompute forward
    xf = x_ref[...].astype(jnp.float32)
    lns = lns_ref[0]
    xn, mu, inv = _ln_forward(xf, lns, lnb_ref[0])
    xn_dt = xn.astype(dt)
    hpre = jax.lax.dot(xn_dt, w1_ref[...],
                       preferred_element_type=jnp.float32) + b1_ref[0]
    h = _gelu(hpre)
    dz_res = dz_ref[...].astype(jnp.float32)   # residual cotangent, unscaled
    # the branch cotangent carries the per-token DropPath scale
    dz = dz_res * s_ref[...].astype(jnp.float32) if scaled else dz_res

    # fc2 backward
    dw2_ref[...] += jax.lax.dot_general(
        h.astype(dt), dz.astype(dt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db2_ref[0] += jnp.sum(dz, axis=0)
    dh = jax.lax.dot_general(dz.astype(dt), w2_ref[...],
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dhpre = dh * _gelu_grad(hpre)

    # fc1 backward
    dw1_ref[...] += jax.lax.dot_general(
        xn_dt, dhpre.astype(dt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1_ref[0] += jnp.sum(dhpre, axis=0)
    dxn = jax.lax.dot_general(dhpre.astype(dt), w1_ref[...],
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)

    # LayerNorm backward
    xhat = (xf - mu) * inv
    dlns_ref[0] += jnp.sum(dxn * xhat, axis=0)
    dlnb_ref[0] += jnp.sum(dxn, axis=0)
    dxhat = dxn * lns
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = inv * (dxhat - m1 - xhat * m2)
    if add_residual or scaled:
        dx = dx + dz_res
    dx_ref[...] = dx.astype(dx_ref.dtype)


def _token_tile(t: int, c: int, hidden: int, bwd: bool) -> int:
    """Token-tile size: multiple of 8 dividing t with the working set inside
    the VMEM budget (f32 x, xn, hidden x2, plus bf16 copies). The forward's
    working set is smaller and its blocks pipeline cleanly, so it gets a
    larger budget — fewer grid steps, less per-step overhead."""
    import os
    per_token = (c * 3 + hidden * (3 if bwd else 2)) * 4
    # MLP_BWD_TILE_MB: swept train knob (like SWIN_BWD_CHUNK_MB) — the
    # backward tile trades VMEM pressure for fewer grid steps.
    budget = (float(os.environ.get('MLP_BWD_TILE_MB', '6')) * 1e6
              if bwd else 11e6)
    best = 8
    tile = 8
    while tile <= t:
        if t % tile == 0 and tile * per_token <= budget:
            best = tile
        tile += 8
    return best


def _const_spec(shape):
    from jax.experimental import pallas as pl
    return pl.BlockSpec(shape, lambda *_: (0,) * len(shape))


def _mlp_forward(interpret, add_residual, x2, ln_scale, ln_bias, w1, b1, w2,
                 b2, s2=None):
    from jax.experimental import pallas as pl

    from jax.experimental.pallas import tpu as pltpu

    t, c = x2.shape
    hidden = w1.shape[1]
    tile = _token_tile(t, c, hidden, bwd=False)
    scaled = s2 is not None
    in_specs = [
        pl.BlockSpec((tile, c), lambda i: (i, 0)),
        _const_spec((1, c)), _const_spec((1, c)),
        _const_spec((c, hidden)), _const_spec((1, hidden)),
        _const_spec((hidden, c)), _const_spec((1, c)),
    ]
    args = [x2, ln_scale[None], ln_bias[None], w1.astype(x2.dtype), b1[None],
            w2.astype(x2.dtype), b2[None]]
    if scaled:
        in_specs.append(pl.BlockSpec((tile, 1), lambda i: (i, 0)))
        args.append(s2)
    return pl.pallas_call(
        functools.partial(_mlp_fwd_kernel, add_residual=add_residual,
                          scaled=scaled),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        grid=(t // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel',)),
        interpret=interpret,
    )(*args)


def _mlp_backward(interpret, add_residual, x2, ln_scale, ln_bias, w1, b1, w2,
                  dz2, s2=None):
    from jax.experimental import pallas as pl

    t, c = x2.shape
    hidden = w1.shape[1]
    tile = _token_tile(t, c, hidden, bwd=True)
    f32 = jnp.float32
    tok = pl.BlockSpec((tile, c), lambda i: (i, 0))
    scaled = s2 is not None
    in_specs = [
        tok,
        _const_spec((1, c)), _const_spec((1, c)),
        _const_spec((c, hidden)), _const_spec((1, hidden)),
        _const_spec((hidden, c)),
        tok,
    ]
    args = [x2, ln_scale[None], ln_bias[None], w1.astype(x2.dtype), b1[None],
            w2.astype(x2.dtype), dz2]
    if scaled:
        in_specs.append(pl.BlockSpec((tile, 1), lambda i: (i, 0)))
        args.append(s2)
    dx, dlns, dlnb, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_mlp_bwd_kernel, add_residual=add_residual,
                          scaled=scaled),
        out_shape=(jax.ShapeDtypeStruct(x2.shape, x2.dtype),
                   jax.ShapeDtypeStruct((1, c), f32),
                   jax.ShapeDtypeStruct((1, c), f32),
                   jax.ShapeDtypeStruct((c, hidden), f32),
                   jax.ShapeDtypeStruct((1, hidden), f32),
                   jax.ShapeDtypeStruct((hidden, c), f32),
                   jax.ShapeDtypeStruct((1, c), f32)),
        grid=(t // tile,),
        in_specs=in_specs,
        out_specs=(tok,
                   _const_spec((1, c)), _const_spec((1, c)),
                   _const_spec((c, hidden)), _const_spec((1, hidden)),
                   _const_spec((hidden, c)), _const_spec((1, c))),
        interpret=interpret,
    )(*args)
    return dx, dlns[0], dlnb[0], dw1.astype(w1.dtype), db1[0], dw2.astype(w2.dtype), db2[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _mlp_vjp(interpret, add_residual, x2, ln_scale, ln_bias, w1, b1, w2, b2):
    return _mlp_forward(interpret, add_residual, x2, ln_scale, ln_bias, w1,
                        b1, w2, b2)


def _mlp_vjp_fwd(interpret, add_residual, x2, ln_scale, ln_bias, w1, b1, w2, b2):
    out = _mlp_forward(interpret, add_residual, x2, ln_scale, ln_bias, w1, b1,
                       w2, b2)
    return out, (x2, ln_scale, ln_bias, w1, b1, w2)


def _mlp_vjp_bwd(interpret, add_residual, res, dz):
    x2, ln_scale, ln_bias, w1, b1, w2 = res
    dx, dlns, dlnb, dw1, db1, dw2, db2 = _mlp_backward(
        interpret, add_residual, x2, ln_scale, ln_bias, w1, b1, w2,
        dz.astype(x2.dtype))
    return dx, dlns, dlnb, dw1, db1, dw2, db2


_mlp_vjp.defvjp(_mlp_vjp_fwd, _mlp_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _mlp_scaled_vjp(interpret, x2, ln_scale, ln_bias, w1, b1, w2, b2, s2):
    """x + s2 * mlp_branch(x) with the per-token DropPath scale s2 (T, 1)
    folded into the kernels. s2 is a random mask — its cotangent is zero."""
    return _mlp_forward(interpret, False, x2, ln_scale, ln_bias, w1, b1, w2,
                        b2, s2=s2)


def _mlp_scaled_fwd(interpret, x2, ln_scale, ln_bias, w1, b1, w2, b2, s2):
    out = _mlp_forward(interpret, False, x2, ln_scale, ln_bias, w1, b1, w2,
                       b2, s2=s2)
    return out, (x2, ln_scale, ln_bias, w1, b1, w2, s2)


def _mlp_scaled_bwd(interpret, res, dz):
    x2, ln_scale, ln_bias, w1, b1, w2, s2 = res
    dx, dlns, dlnb, dw1, db1, dw2, db2 = _mlp_backward(
        interpret, False, x2, ln_scale, ln_bias, w1, b1, w2,
        dz.astype(x2.dtype), s2=s2)
    return dx, dlns, dlnb, dw1, db1, dw2, db2, jnp.zeros_like(s2)


_mlp_scaled_vjp.defvjp(_mlp_scaled_fwd, _mlp_scaled_bwd)


def fused_mlp_block(x, ln_scale, ln_bias, w1, b1, w2, b2,
                    interpret: bool = False, add_residual: bool = False,
                    residual_scale=None):
    """Fused LN+fc1+GELU+fc2 branch; XLA fallback off-TPU.

    Args:
      x: (..., C) tokens (any leading shape).
      ln_scale, ln_bias: (C,) LayerNorm affine.
      w1: (C, hidden); b1: (hidden,); w2: (hidden, C); b2: (C,).
      residual_scale: optional DropPath scale (mask/keep), broadcastable to
        x.shape[:-1] — folds ``x + s*branch`` into the kernel (training
        stochastic depth without the XLA mask/residual round trips).
    Returns: same shape as x — the MLP branch WITHOUT the residual (with it
      when ``add_residual`` or ``residual_scale``).
    """
    from . import dispatch
    interpret = interpret or dispatch.interpret_forced()
    if residual_scale is not None:
        s_full = jnp.broadcast_to(residual_scale, x.shape[:-1]).astype(jnp.float32)
    if not interpret and jax.default_backend() not in ('tpu',):
        out = reference_mlp_block(x, ln_scale, ln_bias, w1, b1, w2, b2)
        if residual_scale is not None:
            return x + out * s_full[..., None].astype(x.dtype)
        return x + out if add_residual else out
    shape = x.shape
    c = shape[-1]
    args = (ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32),
            w1, b1.astype(jnp.float32), w2, b2.astype(jnp.float32))

    mesh, data, spatial = dispatch.mesh_info()
    if mesh is not None:
        # multi-device: run the kernel per-shard under shard_map (batch over
        # 'data', dim-1 over 'spatial'; weights replicated, their grads
        # psum'd by the shard_map transpose)
        from jax.sharding import PartitionSpec as P
        sharded = (x.ndim >= 2 and x.shape[0] % data == 0
                   and (spatial == 1 or (x.ndim >= 3 and x.shape[1] % spatial == 0)))
        local_t = x.size // c // (data * spatial)
        if not sharded or local_t % 8 != 0:
            # un-shardable geometry (val batches of 1, odd shapes): the XLA
            # reference partitions cleanly
            out = reference_mlp_block(x, ln_scale, ln_bias, w1, b1, w2, b2)
            if residual_scale is not None:
                return x + out * s_full[..., None].astype(x.dtype)
            return x + out if add_residual else out
        spec = P('data', 'spatial') if spatial > 1 else P('data')

        if residual_scale is not None:
            def core(xl, sl, lns, lnb, w1_, b1_, w2_, b2_):
                out = _mlp_scaled_vjp(interpret, xl.reshape(-1, c), lns, lnb,
                                      w1_, b1_, w2_, b2_, sl.reshape(-1, 1))
                return out.reshape(xl.shape)

            fn = dispatch.shard_wrap(core, mesh,
                                     in_specs=(spec, spec) + (P(),) * 6,
                                     out_specs=spec)
            return fn(x, s_full, *args)

        def core(xl, lns, lnb, w1_, b1_, w2_, b2_):
            out = _mlp_vjp(interpret, add_residual, xl.reshape(-1, c), lns,
                           lnb, w1_, b1_, w2_, b2_)
            return out.reshape(xl.shape)

        fn = dispatch.shard_wrap(core, mesh,
                                 in_specs=(spec,) + (P(),) * 6, out_specs=spec)
        return fn(x, *args)

    x2 = x.reshape(-1, c)
    if x2.shape[0] % 8 != 0:
        # the (t // tile,) grid would silently leave the last t % 8 rows
        # unwritten (undefined memory) — fail loudly instead (ADVICE r2).
        # SwinIR never hits this (inputs are padded to window multiples).
        raise ValueError(
            f'fused_mlp_block: flattened token count {x2.shape[0]} must be a '
            'multiple of 8 (pad the token dim or use reference_mlp_block)')
    if residual_scale is not None:
        out = _mlp_scaled_vjp(interpret, x2, *args, s_full.reshape(-1, 1))
        return out.reshape(shape)
    out = _mlp_vjp(interpret, add_residual, x2, *args)
    return out.reshape(shape)
