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
    """Pallas-fused windowed MHA; falls back to the XLA reference off-TPU."""
    if not interpret and jax.default_backend() not in ('tpu',):
        return reference_window_attention(qkv, bias, window_size, num_heads, scale)

    from jax.experimental import pallas as pl

    b, h, w, c3 = qkv.shape
    c = c3 // 3
    ws, n = window_size, window_size * window_size
    nw = w // ws
    broadcast_bias = bias.shape[0] == 1
    bias = bias.astype(jnp.float32)

    kernel = functools.partial(_attention_kernel, ws=ws, num_heads=num_heads,
                               c=c, scale=scale, broadcast_bias=broadcast_bias)

    if broadcast_bias:
        bias_spec = pl.BlockSpec((1, num_heads, n, n), lambda bi, j: (0, 0, 0, 0))
    else:
        # one row of windows per grid step: rows of the (nW, heads, n, n) mask
        bias_spec = pl.BlockSpec((nw, num_heads, n, n), lambda bi, j: (j, 0, 0, 0))

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
