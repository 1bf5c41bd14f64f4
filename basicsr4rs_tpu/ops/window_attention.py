"""Fused windowed multi-head attention for Swin-style blocks.

XLA executes the window-attention chain (partition reshape -> per-head
einsums -> bias/mask add -> softmax -> reverse reshape) as separate HBM-level
ops; the attention matrices alone are ``nW x heads x n x n`` and dominate a
SwinIR block's runtime (measured 4.3x slower than this kernel at SwinIR-M
shapes on v5e). This Pallas kernel keeps one row of windows resident in VMEM
and fuses the whole chain:

    qkv (B, H, W, 3C)  ->  attention output (B, H, W, C)

The qkv/proj GEMMs stay in XLA (they are MXU-shaped already). The kernel is
gridded over (batch, window-rows); each cell reads a (ws, W, 3C) strip,
forms its W/ws windows in-register, loops the heads statically, and writes
the (ws, W, C) strip back — attention probabilities never touch HBM.

**Window packing.** A Swin window is tiny for the MXU: ws=8 gives 64-token
score matrices and head_dim is often < 64, so naive per-window dots leave
>90% of the 128x128 systolic array idle. The kernel therefore packs
``p = 128 // n`` adjacent windows into one attention block: scores become
(p*n, p*n) = 128-wide MXU tiles and the softmax uses all VPU lanes. The
cross-window quadrants get a -1e9 additive mask baked into the packed bias,
so the softmax over the packed row is EXACTLY the per-window softmax (the
masked terms underflow to zero) — at the cost of p x the dot FLOPs, a trade
that measures ~3x faster end-to-end (attention FLOPs are only ~8% of a
SwinIR block).

Numerics match the reference path (f32 softmax) — asserted by
tests/test_ops/test_window_attention.py both in interpret mode and against
the einsum reference.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

_MASK = -1e9


def reference_window_attention(qkv: jnp.ndarray, bias: jnp.ndarray,
                               window_size: int, num_heads: int,
                               scale: float) -> jnp.ndarray:
    """Pure-XLA reference (and non-TPU fallback).

    Args:
      qkv: (B, H, W, 3C).
      bias: (nWb, heads, n, n) — relative-position bias (+ shift mask); nWb is
        1 (broadcast over windows) or the number of windows per image.
      window_size, num_heads, scale: attention geometry.
    Returns: (B, H, W, C).
    """
    b, h, w, c3 = qkv.shape
    c = c3 // 3
    ws, n = window_size, window_size * window_size
    hd = c // num_heads
    nwh, nww = h // ws, w // ws

    x = qkv.reshape(b, nwh, ws, nww, ws, c3).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b * nwh * nww, n, c3)
    q, k, v = jnp.split(x.reshape(-1, n, 3, num_heads, hd), 3, axis=2)
    q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
    attn = jnp.einsum('nqhc,nkhc->nhqk', (q * scale).astype(jnp.float32),
                      k.astype(jnp.float32))
    nwb = bias.shape[0]
    attn = attn.reshape(b * nwh * nww // nwb, nwb, num_heads, n, n) + bias[None]
    attn = jax.nn.softmax(attn.reshape(-1, num_heads, n, n), axis=-1)
    out = jnp.einsum('nhqk,nkhc->nqhc', attn.astype(qkv.dtype), v)
    out = out.reshape(b, nwh, nww, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(b, h, w, c)


# --------------------------------------------------------------- packing
def _pack_factor(n: int, nw: int, cap: int = 128) -> int:
    """Windows packed per attention block: largest p with p*n <= cap that
    divides the windows-per-row count."""
    for p in (8, 4, 2):
        if p * n <= cap and nw % p == 0:
            return p
    return 1


def _pack_bias(bias: jnp.ndarray, p: int, n: int) -> jnp.ndarray:
    """(nwb, H, n, n) -> (nwb/p | 1, H, p*n, p*n): block-diagonal bias with
    -1e9 on the cross-window quadrants (masked out of the packed softmax)."""
    if p == 1:
        return bias
    nwb, nh = bias.shape[:2]
    eye = jnp.eye(p, dtype=bool)[None, None, :, None, :, None]
    if nwb == 1:
        full = jnp.broadcast_to(bias[:, :, None, :, None, :], (1, nh, p, n, p, n))
    else:
        grp = bias.reshape(nwb // p, p, nh, n, n).transpose(0, 2, 1, 3, 4)
        full = jnp.broadcast_to(grp[:, :, :, :, None, :],
                                (nwb // p, nh, p, n, p, n))
    out = jnp.where(eye, full, jnp.float32(_MASK))
    return out.reshape(out.shape[0], nh, p * n, p * n)


def _unpack_dbias(dbias_p: jnp.ndarray, p: int, n: int, nwb: int) -> jnp.ndarray:
    """Extract the diagonal blocks of a packed dbias back to (nwb, H, n, n).
    (The off-diagonal quadrants hold exact zeros: P there is 0 after the
    masked softmax, and dS = P * (...) inherits the zero.)"""
    if p == 1:
        return dbias_p
    g, nh = dbias_p.shape[:2]
    blocks = dbias_p.reshape(g, nh, p, n, p, n)
    idx = jnp.arange(p)
    diag = blocks[:, :, idx, :, idx, :]          # (p, g, nh, n, n)
    if nwb == 1:
        return diag.sum(axis=0)                   # (1, nh, n, n)
    return diag.transpose(1, 0, 2, 3, 4).reshape(nwb, nh, n, n)


# --------------------------------------------------------------- kernels
def _attention_kernel(qkv_ref, bias_ref, out_ref, *, ws: int, num_heads: int,
                      c: int, scale: float, broadcast_bias: bool, pack: int):
    strip = qkv_ref[0]                      # (ws, W, 3C)
    width = strip.shape[1]
    nw = width // ws
    n = ws * ws
    hd = c // num_heads
    ng, pn = nw // pack, pack * n           # window groups of pn tokens

    # (ws, W, 3C) -> (nw, n, 3C) -> adjacent windows packed: (ng, pn, 3C)
    xw = strip.reshape(ws, nw, ws, 3 * c).transpose(1, 0, 2, 3).reshape(ng, pn, 3 * c)
    outs = []
    from .swin_block import _scores_gemm
    for head in range(num_heads):
        q = xw[:, :, head * hd:(head + 1) * hd]
        k = xw[:, :, c + head * hd:c + (head + 1) * hd]
        v = xw[:, :, 2 * c + head * hd:2 * c + (head + 1) * hd]
        attn = _scores_gemm(q, k, scale, (((2,), (2,)), ((0,), (0,))))
        if broadcast_bias:
            attn = attn + bias_ref[0, head]
        else:
            attn = attn + bias_ref[:, head]
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        o = jax.lax.dot_general(attn, v, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)      # (ng, pn, hd)
        outs.append(o)
    out = jnp.concatenate(outs, axis=-1)    # (ng, pn, C)
    out = out.reshape(nw, ws, ws, c).transpose(1, 0, 2, 3).reshape(ws, width, c)
    out_ref[0] = out.astype(out_ref.dtype)


def fused_window_attention(qkv: jnp.ndarray, bias: jnp.ndarray, window_size: int,
                           num_heads: int, scale: float,
                           interpret: bool = False) -> jnp.ndarray:
    """Pallas-fused windowed MHA; falls back to the XLA reference off-TPU.

    Differentiable: a custom VJP recomputes the attention probabilities in a
    backward kernel (flash-style — nothing but qkv is saved) and emits
    gradients for both ``qkv`` and ``bias`` (the relative-position table
    trains through the bias gather outside)."""
    from . import dispatch
    interpret = interpret or dispatch.interpret_forced()
    if not interpret and jax.default_backend() not in ('tpu',):
        return reference_window_attention(qkv, bias, window_size, num_heads, scale)

    mesh, data, spatial = dispatch.mesh_info()
    if mesh is not None:
        # multi-device: per-shard kernel under shard_map; contract in
        # dispatch.window_shard_specs.
        b, h, w, _ = qkv.shape
        nwb = bias.shape[0]
        specs = dispatch.window_shard_specs(data, spatial, b, h, w,
                                            window_size, nwb)
        if specs is None:
            return reference_window_attention(qkv, bias, window_size,
                                              num_heads, scale)
        qspec, bias_spec = specs
        core = functools.partial(_fused_fwd_vjp, window_size, num_heads,
                                 scale, interpret)
        fn = dispatch.shard_wrap(core, mesh, in_specs=(qspec, bias_spec),
                                 out_specs=qspec)
        return fn(qkv, bias.astype(jnp.float32))

    return _fused_fwd_vjp(window_size, num_heads, scale, interpret, qkv,
                          bias.astype(jnp.float32))


def _bias_spec_and_flag(bias_shape, num_heads, pn, ng, batch_minor=False):
    """Packed-bias BlockSpec for a (batch, window-rows) grid — or its
    transpose (window-rows, batch) when ``batch_minor`` (the backward
    kernel's grid, which needs the dbias reduction axis innermost)."""
    from jax.experimental import pallas as pl
    broadcast = bias_shape[0] == 1
    if broadcast:
        return pl.BlockSpec((1, num_heads, pn, pn), lambda *_: (0, 0, 0, 0)), True
    if batch_minor:
        return pl.BlockSpec((ng, num_heads, pn, pn), lambda j, bi: (j, 0, 0, 0)), False
    return pl.BlockSpec((ng, num_heads, pn, pn), lambda bi, j: (j, 0, 0, 0)), False


def _fused_forward(window_size, num_heads, scale, interpret, qkv, bias):
    from jax.experimental import pallas as pl

    b, h, w, c3 = qkv.shape
    c = c3 // 3
    ws, n = window_size, window_size * window_size
    nw = w // ws
    pack = _pack_factor(n, nw)
    ng, pn = nw // pack, pack * n
    bias_p = _pack_bias(bias, pack, n)
    bias_spec, broadcast_bias = _bias_spec_and_flag(bias_p.shape, num_heads, pn, ng)
    kernel = functools.partial(_attention_kernel, ws=ws, num_heads=num_heads,
                               c=c, scale=scale, broadcast_bias=broadcast_bias,
                               pack=pack)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), qkv.dtype),
        grid=(b, h // ws),
        in_specs=[
            pl.BlockSpec((1, ws, w, c3), lambda bi, j: (bi, j, 0, 0)),
            bias_spec,
        ],
        out_specs=pl.BlockSpec((1, ws, w, c), lambda bi, j: (bi, j, 0, 0)),
        interpret=interpret,
    )(qkv, bias_p)


def _attention_bwd_kernel(qkv_ref, bias_ref, dout_ref, dqkv_ref, dbias_ref, *,
                          ws: int, num_heads: int, c: int, scale: float,
                          broadcast_bias: bool, pack: int):
    """Recompute P per packed window group, then the standard softmax VJP:
    dV = P^T dO; dP = dO V^T; dS = P * (dP - rowsum(dP*P));
    dQ = scale * dS K; dK = scale * dS^T Q; dbias = sum_batch dS."""
    from jax.experimental import pallas as pl

    strip = qkv_ref[0]                    # (ws, W, 3C)
    dout = dout_ref[0]                    # (ws, W, C)
    width = strip.shape[1]
    nw = width // ws
    n = ws * ws
    hd = c // num_heads
    ng, pn = nw // pack, pack * n

    xw = strip.reshape(ws, nw, ws, 3 * c).transpose(1, 0, 2, 3).reshape(ng, pn, 3 * c)
    dow = dout.reshape(ws, nw, ws, c).transpose(1, 0, 2, 3).reshape(ng, pn, c)

    dq_parts, dk_parts, dv_parts = [], [], []
    # dbias blocks are accumulated across grid revisits. The bwd grid is
    # (window-rows, batch) with batch MINORMOST: Pallas TPU only keeps an
    # output block resident across *consecutive* iterations, so the reduction
    # axis (batch; plus window-rows for broadcast bias) must be innermost —
    # with the batch axis outer, a per-window-row dbias block would be
    # flushed and revisited stale. Zero the block on its first visit.
    if broadcast_bias:
        first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)
    else:
        first = pl.program_id(1) == 0  # block j first seen at batch 0

    @pl.when(first)
    def _init():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    from .swin_block import _scores_gemm
    dt = xw.dtype
    for head in range(num_heads):
        # non-scores GEMM inputs in the model dtype, f32 accumulation (same
        # convention as _block_bwd_kernel); softmax/VJP arithmetic stays f32
        q = xw[:, :, head * hd:(head + 1) * hd]
        k = xw[:, :, c + head * hd:c + (head + 1) * hd]
        v = xw[:, :, 2 * c + head * hd:2 * c + (head + 1) * hd]
        do = dow[:, :, head * hd:(head + 1) * hd].astype(dt)

        s = _scores_gemm(q, k, scale, (((2,), (2,)), ((0,), (0,))))
        if broadcast_bias:
            s = s + bias_ref[0, head]
        else:
            s = s + bias_ref[:, head]
        p = jax.nn.softmax(s, axis=-1)                                  # (ng, pn, pn)
        p_dt = p.astype(dt)

        dv = jax.lax.dot_general(p_dt, do, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)    # (ng, pn, hd)
        dp = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)    # (ng, pn, pn)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds_dt = ds.astype(dt)
        dq = scale * jax.lax.dot_general(ds_dt, k, (((2,), (1,)), ((0,), (0,))),
                                         preferred_element_type=jnp.float32)
        dk = scale * jax.lax.dot_general(ds_dt, q, (((1,), (1,)), ((0,), (0,))),
                                         preferred_element_type=jnp.float32)
        dq_parts.append(dq)
        dk_parts.append(dk)
        dv_parts.append(dv)
        if broadcast_bias:
            dbias_ref[0, head] += jnp.sum(ds, axis=0)
        else:
            dbias_ref[:, head] += ds

    dxw = jnp.concatenate(dq_parts + dk_parts + dv_parts, axis=-1)      # (ng, pn, 3C)
    dstrip = dxw.reshape(nw, ws, ws, 3 * c).transpose(1, 0, 2, 3).reshape(ws, width, 3 * c)
    dqkv_ref[0] = dstrip.astype(dqkv_ref.dtype)


def _fused_bwd(window_size, num_heads, scale, interpret, qkv, bias, dout):
    from jax.experimental import pallas as pl

    b, h, w, c3 = qkv.shape
    c = c3 // 3
    ws, n = window_size, window_size * window_size
    nw = w // ws
    pack = _pack_factor(n, nw)
    ng, pn = nw // pack, pack * n
    bias_p = _pack_bias(bias, pack, n)
    # Grid is (window-rows, batch) — batch minormost so per-window-row dbias
    # blocks are revisited on consecutive iterations (TPU output-revisit rule).
    bias_spec, broadcast_bias = _bias_spec_and_flag(bias_p.shape, num_heads, pn, ng,
                                                    batch_minor=True)
    kernel = functools.partial(_attention_bwd_kernel, ws=ws, num_heads=num_heads,
                               c=c, scale=scale, broadcast_bias=broadcast_bias,
                               pack=pack)
    dqkv, dbias_p = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),
                   jax.ShapeDtypeStruct(bias_p.shape, jnp.float32)),
        grid=(h // ws, b),
        in_specs=[
            pl.BlockSpec((1, ws, w, c3), lambda j, bi: (bi, j, 0, 0)),
            bias_spec,
            pl.BlockSpec((1, ws, w, c), lambda j, bi: (bi, j, 0, 0)),
        ],
        out_specs=(pl.BlockSpec((1, ws, w, c3), lambda j, bi: (bi, j, 0, 0)),
                   bias_spec),
        interpret=interpret,
    )(qkv, bias_p, dout)
    return dqkv, _unpack_dbias(dbias_p, pack, n, bias.shape[0])


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _fused_fwd_vjp(window_size, num_heads, scale, interpret, qkv, bias):
    return _fused_forward(window_size, num_heads, scale, interpret, qkv, bias)


def _vjp_fwd(window_size, num_heads, scale, interpret, qkv, bias):
    out = _fused_forward(window_size, num_heads, scale, interpret, qkv, bias)
    return out, (qkv, bias)


def _vjp_bwd(window_size, num_heads, scale, interpret, res, dout):
    qkv, bias = res
    dqkv, dbias = _fused_bwd(window_size, num_heads, scale, interpret,
                             qkv, bias, dout.astype(qkv.dtype))
    return dqkv, dbias


_fused_fwd_vjp.defvjp(_vjp_fwd, _vjp_bwd)
