"""Fused windowed multi-head attention for Swin-style blocks.

XLA executes the window-attention chain (partition reshape -> per-head
einsums -> bias/mask add -> softmax -> reverse reshape) as separate HBM-level
ops; the attention matrices alone are ``nW x heads x n x n`` and dominate a
SwinIR block's runtime (~2/3 measured on v5e). This Pallas kernel keeps one
row of windows resident in VMEM and fuses the whole chain:

    qkv (B, H, W, 3C)  ->  attention output (B, H, W, C)

The qkv/proj GEMMs stay in XLA (they are MXU-shaped already). The kernel is
gridded over (batch, window-rows); each cell reads a (ws, W, 3C) strip,
forms its W/ws windows in-register, loops the heads statically, and writes
the (ws, W, C) strip back — attention probabilities never touch HBM.

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


def _attention_kernel(qkv_ref, bias_ref, out_ref, *, ws: int, num_heads: int,
                      c: int, scale: float, broadcast_bias: bool):
    strip = qkv_ref[0]                      # (ws, W, 3C)
    width = strip.shape[1]
    nw = width // ws
    n = ws * ws
    hd = c // num_heads

    # (ws, W, 3C) -> (nw, n, 3C): gather each window's rows together
    xw = strip.reshape(ws, nw, ws, 3 * c).transpose(1, 0, 2, 3).reshape(nw, n, 3 * c)
    outs = []
    for head in range(num_heads):
        q = xw[:, :, head * hd:(head + 1) * hd].astype(jnp.float32) * scale
        k = xw[:, :, c + head * hd:c + (head + 1) * hd].astype(jnp.float32)
        v = xw[:, :, 2 * c + head * hd:2 * c + (head + 1) * hd]
        attn = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32)  # (nw, n, n)
        if broadcast_bias:
            attn = attn + bias_ref[0, head]
        else:
            attn = attn + bias_ref[:, head]
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        o = jax.lax.dot_general(attn, v, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)      # (nw, n, hd)
        outs.append(o)
    out = jnp.concatenate(outs, axis=-1)    # (nw, n, C)
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
    if not interpret and jax.default_backend() not in ('tpu',):
        return reference_window_attention(qkv, bias, window_size, num_heads, scale)
    return _fused_fwd_vjp(window_size, num_heads, scale, interpret, qkv,
                          bias.astype(jnp.float32))


def _bias_spec_and_flag(bias_shape, num_heads, n, nw, batch_minor=False):
    """Bias BlockSpec for a (batch, window-rows) grid — or its transpose
    (window-rows, batch) when ``batch_minor`` (the backward kernel's grid,
    which needs the dbias reduction axis innermost)."""
    from jax.experimental import pallas as pl
    broadcast = bias_shape[0] == 1
    if broadcast:
        return pl.BlockSpec((1, num_heads, n, n), lambda *_: (0, 0, 0, 0)), True
    if batch_minor:
        return pl.BlockSpec((nw, num_heads, n, n), lambda j, bi: (j, 0, 0, 0)), False
    return pl.BlockSpec((nw, num_heads, n, n), lambda bi, j: (j, 0, 0, 0)), False


def _fused_forward(window_size, num_heads, scale, interpret, qkv, bias):
    from jax.experimental import pallas as pl

    b, h, w, c3 = qkv.shape
    c = c3 // 3
    ws, n = window_size, window_size * window_size
    nw = w // ws
    bias_spec, broadcast_bias = _bias_spec_and_flag(bias.shape, num_heads, n, nw)
    kernel = functools.partial(_attention_kernel, ws=ws, num_heads=num_heads,
                               c=c, scale=scale, broadcast_bias=broadcast_bias)
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
    )(qkv, bias)


def _attention_bwd_kernel(qkv_ref, bias_ref, dout_ref, dqkv_ref, dbias_ref, *,
                          ws: int, num_heads: int, c: int, scale: float,
                          broadcast_bias: bool):
    """Recompute P per window, then the standard softmax-attention VJP:
    dV = P^T dO; dP = dO V^T; dS = P * (dP - rowsum(dP*P));
    dQ = scale * dS K; dK = scale * dS^T Q; dbias = sum_windows dS."""
    from jax.experimental import pallas as pl

    strip = qkv_ref[0]                    # (ws, W, 3C)
    dout = dout_ref[0]                    # (ws, W, C)
    width = strip.shape[1]
    nw = width // ws
    n = ws * ws
    hd = c // num_heads

    xw = strip.reshape(ws, nw, ws, 3 * c).transpose(1, 0, 2, 3).reshape(nw, n, 3 * c)
    dow = dout.reshape(ws, nw, ws, c).transpose(1, 0, 2, 3).reshape(nw, n, c)

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

    for head in range(num_heads):
        q = xw[:, :, head * hd:(head + 1) * hd].astype(jnp.float32)
        k = xw[:, :, c + head * hd:c + (head + 1) * hd].astype(jnp.float32)
        v = xw[:, :, 2 * c + head * hd:2 * c + (head + 1) * hd].astype(jnp.float32)
        do = dow[:, :, head * hd:(head + 1) * hd].astype(jnp.float32)

        s = jax.lax.dot_general(q * scale, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        if broadcast_bias:
            s = s + bias_ref[0, head]
        else:
            s = s + bias_ref[:, head]
        p = jax.nn.softmax(s, axis=-1)                                  # (nw, n, n)

        dv = jax.lax.dot_general(p, do, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)    # (nw, n, hd)
        dp = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)    # (nw, n, n)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq = scale * jax.lax.dot_general(ds, k, (((2,), (1,)), ((0,), (0,))),
                                         preferred_element_type=jnp.float32)
        dk = scale * jax.lax.dot_general(ds, q, (((1,), (1,)), ((0,), (0,))),
                                         preferred_element_type=jnp.float32)
        dq_parts.append(dq)
        dk_parts.append(dk)
        dv_parts.append(dv)
        if broadcast_bias:
            dbias_ref[0, head] += jnp.sum(ds, axis=0)
        else:
            dbias_ref[:, head] += ds

    dxw = jnp.concatenate(dq_parts + dk_parts + dv_parts, axis=-1)      # (nw, n, 3C)
    dstrip = dxw.reshape(nw, ws, ws, 3 * c).transpose(1, 0, 2, 3).reshape(ws, width, 3 * c)
    dqkv_ref[0] = dstrip.astype(dqkv_ref.dtype)


def _fused_bwd(window_size, num_heads, scale, interpret, qkv, bias, dout):
    from jax.experimental import pallas as pl

    b, h, w, c3 = qkv.shape
    c = c3 // 3
    ws, n = window_size, window_size * window_size
    nw = w // ws
    # Grid is (window-rows, batch) — batch minormost so per-window-row dbias
    # blocks are revisited on consecutive iterations (TPU output-revisit rule).
    bias_spec, broadcast_bias = _bias_spec_and_flag(bias.shape, num_heads, n, nw,
                                                    batch_minor=True)
    kernel = functools.partial(_attention_bwd_kernel, ws=ws, num_heads=num_heads,
                               c=c, scale=scale, broadcast_bias=broadcast_bias)
    dqkv, dbias = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),
                   jax.ShapeDtypeStruct(bias.shape, jnp.float32)),
        grid=(h // ws, b),
        in_specs=[
            pl.BlockSpec((1, ws, w, c3), lambda j, bi: (bi, j, 0, 0)),
            bias_spec,
            pl.BlockSpec((1, ws, w, c), lambda j, bi: (bi, j, 0, 0)),
        ],
        out_specs=(pl.BlockSpec((1, ws, w, c3), lambda j, bi: (bi, j, 0, 0)),
                   bias_spec),
        interpret=interpret,
    )(qkv, bias, dout)
    return dqkv, dbias


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
