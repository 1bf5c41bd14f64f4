"""Fused Swin attention-branch kernel: LN1 -> qkv GEMM -> windowed MHA ->
proj, in ONE Pallas call.

Motivation (measured on v5e, SwinIR-M x4, batch 8x64x64): with the
qkv-level fused attention kernel the model still spends ~half its time
shuttling intermediates through HBM — LayerNorm read/write, the qkv tensor
(3C wide) written by XLA and re-read by the kernel, the attention output
re-read by the proj GEMM. Fusing the whole branch keeps every intermediate
in VMEM: per layer the branch touches HBM only for x in (C wide) and the
branch output (C wide), ~6x less traffic. The window-packing trick from
``ops/window_attention.py`` (p windows per 128-wide MXU block, cross-window
quadrants masked with -1e9) is reused for the attention dots.

DropPath stays OUTSIDE (the caller owns it). By default the kernel computes
exactly ``proj(attn(LN(x))) + b_proj``; with ``add_residual`` the shortcut
add folds in for free (the kernel input IS the rolled shortcut, and
roll-back commutes with the addition) — used whenever DropPath is identity.
Attention runs all heads in one batched matmul pair + one softmax, with
q/k/v laid out head-major via axis-0 concatenation of lane slices (Mosaic
allows one matmul batch dim and no lane-dim shape casts).

Backward is a single Pallas kernel too: it recomputes LN/qkv/attention
(flash-style — only x is saved) and emits gradients for x, the LN affine,
Wqkv/bqkv, Wproj/bproj, and the (packed) attention bias. Weight gradients
accumulate across the whole grid in constant-index f32 output blocks; the
grid is (window-rows, W-chunks, batch) with batch minormost so per-row
dbias blocks are revisited on consecutive iterations (TPU output-revisit
rule). W is processed in chunks sized to keep the backward working set
inside the ~16 MB VMEM.

Numerics match the unfused module path (f32 LN statistics and softmax)
at bf16-rounding tolerance — asserted in tests/test_ops/test_swin_block.py
in interpret mode, and against the XLA path on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .window_attention import (_pack_bias, _pack_factor, _unpack_dbias,
                               reference_window_attention)

_LN_EPS = 1e-5


# ------------------------------------------------------------- reference
def reference_swin_attn_block(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                              bias, window_size: int, num_heads: int,
                              scale: float):
    """Pure-XLA branch (non-TPU fallback; autodiff provides the backward).
    x: (B, H, W, C); returns proj(attn(LN(x))) + bproj, same shape/dtype."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu)
    xn = (xf - mu) * jax.lax.rsqrt(var + _LN_EPS)
    xn = xn * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    qkv = (xn.astype(dt) @ wqkv.astype(dt)).astype(jnp.float32) + bqkv.astype(jnp.float32)
    a = reference_window_attention(qkv.astype(dt), bias, window_size,
                                   num_heads, scale)
    z = (a @ wproj.astype(dt)).astype(jnp.float32) + bproj.astype(jnp.float32)
    return z.astype(dt)


# ----------------------------------------------------------- chunk sizing
def _chunk_cols(w: int, ws: int, pack: int, c: int, num_heads: int,
                bwd: bool, hidden: int = 0) -> int:
    """Largest W-chunk (multiple of ws*pack, divides w) whose working set
    fits VMEM (~16MB; budget ~6MB for the f32 buffers): roughly 8 live
    (T, C) token tensors in the backward (3 in the forward) plus the
    head-batched attention matrices — (heads*ng, pn, pn) f32, ~4 live in the
    backward (s/p/dp/ds), 2 in the forward — which cost heads*pn*4 bytes
    per token. ``hidden`` adds the joint kernel's MLP activations
    (pre-GELU + GELU output, f32)."""
    import os
    unit = ws * pack
    pn = pack * ws * ws
    per_token_bytes = (c * 4 * (8 if bwd else 3)
                       + num_heads * pn * 4 * (4 if bwd else 2)
                       + hidden * 4 * 2)
    # The backward's chunk budget is a swept knob (SWIN_BWD_CHUNK_MB): at
    # SwinIR-M train geometry 6 MB gives cw=32 (2 W-chunks, 128 grid cells
    # at B8); larger budgets trade VMEM pressure for fewer, bigger grid
    # cells. The forward keeps the 6 MB default (its rows knob is
    # SWIN_ROW_BUDGET_MB, see _row_batch).
    budget = (float(os.environ.get('SWIN_BWD_CHUNK_MB', '6')) * 1e6
              if bwd else 6e6)
    best = unit
    cw = unit
    while cw <= w:
        if w % cw == 0 and ws * cw * per_token_bytes <= budget:
            best = cw
        cw += unit
    return best


# --------------------------------------------------------------- kernels
def _window_pack(x, ws, nw, pack, c3):
    """(ws, CW, C') -> (ng*pn, C') token rows in packed-window order."""
    n = ws * ws
    ng = nw // pack
    return (x.reshape(ws, nw, ws, c3).transpose(1, 0, 2, 3)
            .reshape(ng * pack * n, c3))


def _window_unpack(x, ws, nw, cw, c3):
    """inverse of _window_pack: (T, C') -> (ws, CW, C')."""
    return (x.reshape(nw, ws, ws, c3).transpose(1, 0, 2, 3)
            .reshape(ws, cw, c3))


def _ln_forward(xf, ln_scale, ln_bias):
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    inv = jax.lax.rsqrt(var + _LN_EPS)
    xn = (xf - mu) * inv * ln_scale + ln_bias
    return xn, mu, inv


def _split_heads(qkv3, num_heads, c):
    """(ng, pn, 3C') -> q, k, v each (heads*ng, pn, hd'), head-major on the
    leading (batch) dim. Built by concatenating per-head lane slices along
    axis 0 — Mosaic matmul supports a single batch dim and no lane-dim
    shape casts, so this is the layout the batched dots need. ``c`` is the
    (possibly head-padded) attention width heads*hd'."""
    hd = c // num_heads

    def part(i):
        return jnp.concatenate(
            [qkv3[:, :, i * c + h * hd:i * c + (h + 1) * hd]
             for h in range(num_heads)], axis=0)

    return part(0), part(1), part(2)


def _padded_hd(hd: int) -> int:
    """Head dim padded up to a multiple of 8 lanes (SWIN_PAD_HEADS=0 to
    disable). SwinIR-M's hd=30 puts every per-head lane slice at a
    misaligned offset (0,30,60,...), forcing expensive VPU lane rotates in
    the head-major relayouts; hd=32 makes all offsets 8-aligned. The pad is
    FREE on the MXU (K/N tiles round to 128 anyway) — measured 16.2 ms ->
    12.6 ms on the 36-block attention chain when the whole model runs at
    hd=32 (scripts/exp_swin_variants.py --c 192)."""
    import os
    if os.environ.get('SWIN_PAD_HEADS', '1') == '0':
        return hd
    return ((hd + 7) // 8) * 8


def _pad_head_weights(wqkv, bqkv, wproj, num_heads, hd, hdp):
    """Zero-pad each head's slice of the qkv/proj weights from hd to hdp
    lanes, so the kernel's per-head slices are 8-aligned. Zero q/k pad
    lanes contribute nothing to the attention dots and zero v lanes /
    proj rows produce exactly the unpadded output."""
    c = num_heads * hd
    pad = hdp - hd
    w = jnp.pad(wqkv.reshape(c, 3, num_heads, hd),
                ((0, 0), (0, 0), (0, 0), (0, pad)))
    bq = jnp.pad(bqkv.reshape(3, num_heads, hd), ((0, 0), (0, 0), (0, pad)))
    wp = jnp.pad(wproj.reshape(num_heads, hd, c), ((0, 0), (0, pad), (0, 0)))
    return (w.reshape(c, 3 * num_heads * hdp), bq.reshape(3 * num_heads * hdp),
            wp.reshape(num_heads * hdp, c))


def _scores_mode() -> str:
    """How the qk scores GEMM runs (SWIN_SCORES_MODE, measurement knob):
    'f32'    — upcast q/k to f32 and fold the qk scale into q (the original
               convention; measured FASTEST on v5e despite the f32 GEMM's
               multi-pass MXU decomposition: 24.7 MP/s headline vs 22.3 for
               'post' — Mosaic evidently sees through the convert-from-bf16
               and the post-scale pass over the (heads·ng, pn, pn) scores
               is pure added VPU traffic),
    'post'   — model-dtype GEMM, scalar scale applied to the f32 scores,
    'folded' — model-dtype GEMM with the scale pre-folded into q (one extra
               bf16 rounding on q)."""
    import os
    return os.environ.get('SWIN_SCORES_MODE', 'f32')


def _scores_gemm(q, k, scale, dims):
    mode = _scores_mode()
    if mode == 'f32':
        return jax.lax.dot_general(q.astype(jnp.float32) * scale,
                                   k.astype(jnp.float32), dims,
                                   preferred_element_type=jnp.float32)
    if mode == 'folded':
        return jax.lax.dot_general((q * scale).astype(q.dtype), k, dims,
                                   preferred_element_type=jnp.float32)
    return jax.lax.dot_general(q, k, dims,
                               preferred_element_type=jnp.float32) * scale


def _attention_probs(qkv3, bias_arr, num_heads, c, scale, broadcast_bias):
    """Head-batched scores + softmax: returns (p, v) with
    p (heads*ng, pn, pn) f32 and v (heads*ng, pn, hd). bias_arr is packed
    head-major: (heads, 1|ng, pn, pn)."""
    ng, pn, _ = qkv3.shape
    q, k, v = _split_heads(qkv3, num_heads, c)
    s = _scores_gemm(q, k, scale, (((2,), (2,)), ((0,), (0,))))
    s4 = s.reshape(num_heads, ng, pn, pn)
    p = jax.nn.softmax(s4 + bias_arr, axis=-1)   # (heads, 1|ng, pn, pn)
    return p.reshape(num_heads * ng, pn, pn), v


def _attention_heads(qkv3, bias_arr, num_heads, c, scale, broadcast_bias,
                     out_dtype):
    """qkv3: (ng, pn, 3C) -> attention output (ng, pn, C). All heads in one
    batched matmul pair + one softmax (batch dim heads*ng)."""
    if _head_loop():
        return _attention_heads_looped(qkv3, bias_arr, num_heads, c, scale,
                                       out_dtype)
    ng, pn, _ = qkv3.shape
    hd = c // num_heads
    p, v = _attention_probs(qkv3, bias_arr, num_heads, c, scale, broadcast_bias)
    o = jax.lax.dot_general(p.astype(out_dtype), v,
                            (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    return jnp.concatenate([o[h * ng:(h + 1) * ng] for h in range(num_heads)],
                           axis=-1)


def _attention_heads_looped(qkv3, bias_arr, num_heads, c, scale, out_dtype):
    """Per-head static loop on direct lane slices (no axis-0 concat
    relayouts); bias_arr broadcasts over ng when its dim-1 is 1."""
    ng, pn, _ = qkv3.shape
    hd = c // num_heads
    outs = []
    for h in range(num_heads):
        q = qkv3[:, :, h * hd:(h + 1) * hd]
        k = qkv3[:, :, c + h * hd:c + (h + 1) * hd]
        v = qkv3[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
        s = _scores_gemm(q, k, scale, (((2,), (2,)), ((0,), (0,))))
        p = jax.nn.softmax(s + bias_arr[h], axis=-1)
        o = jax.lax.dot_general(p.astype(out_dtype), v,
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        outs.append(o)
    return jnp.concatenate(outs, axis=-1)


def _block_fwd_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref,
                      bproj_ref, bias_ref, *rest, ws, num_heads, c,
                      catt, scale, broadcast_bias, pack, add_residual, rows=1,
                      scaled=False):
    # scaled=True appends a per-batch residual scale s (DropPath mask/keep,
    # full (B, 1) block — TPU lowering rejects (1, 1) blocks — indexed by
    # the batch grid position): out = s*branch + x
    if scaled:
        from jax.experimental import pallas as pl
        s_ref, out_ref = rest
        s = s_ref[pl.program_id(0), 0].astype(jnp.float32)
    else:
        out_ref, = rest
    xall = x_ref[0]                            # (rows*ws, CW, C)
    cw = xall.shape[1]
    nw = cw // ws
    n = ws * ws
    ng, pn = nw // pack, pack * n
    dt = xall.dtype
    bias_all = bias_ref[...]                   # (heads, 1 | rows*ng, pn, pn)

    for r in range(rows):
        x = xall[r * ws:(r + 1) * ws]
        bias_arr = (bias_all if broadcast_bias
                    else bias_all[:, r * ng:(r + 1) * ng])
        xw = _window_pack(x, ws, nw, pack, c)      # (T, C)
        xn, _, _ = _ln_forward(xw.astype(jnp.float32), lns_ref[0], lnb_ref[0])
        qkv = jax.lax.dot(xn.astype(dt), wqkv_ref[...],
                          preferred_element_type=jnp.float32) + bqkv_ref[0]
        a = _attention_heads(qkv.astype(dt).reshape(ng, pn, 3 * catt), bias_arr,
                             num_heads, catt, scale, broadcast_bias, dt)
        z = jax.lax.dot(a.reshape(ng * pn, catt).astype(dt), wproj_ref[...],
                        preferred_element_type=jnp.float32) + bproj_ref[0]
        if scaled:
            z = z * s + xw.astype(jnp.float32)
        elif add_residual:
            # the kernel input IS the (rolled) shortcut, so the residual add
            # is free here; roll-back outside commutes with the addition
            z = z + xw.astype(jnp.float32)
        out_ref[0, r * ws:(r + 1) * ws] = _window_unpack(
            z.astype(out_ref.dtype), ws, nw, cw, c)


def _joint_fwd_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref,
                      bproj_ref, bias_ref, ln2s_ref, ln2b_ref, w1_ref, b1_ref,
                      w2_ref, b2_ref, *rest, ws, num_heads, c, catt,
                      scale, broadcast_bias, pack, rows=1, scaled=False):
    """Whole Swin block in ONE grid cell: attention branch + residual, then
    LN2+fc1+GELU+fc2 + residual (the MLP is per-token, so running it before
    the caller's shift roll-back is numerically identical). Used when both
    residuals fold (DropPath identity) — removes the kernel-boundary HBM
    round trip of the post-attention activation that the two-call structure
    pays per block.

    scaled=True appends two per-batch residual scales s1/s2 (DropPath
    mask/keep for the attention and MLP branches, full (B, 1) blocks indexed
    by the batch grid position): y = s1*attn + x; out = s2*mlp + y — the
    training stochastic-depth semantics of reference swinir_arch.py:262."""
    from .mlp_block import _gelu

    if scaled:
        from jax.experimental import pallas as pl
        s1_ref, s2_ref, out_ref = rest
        s1 = s1_ref[pl.program_id(0), 0].astype(jnp.float32)
        s2 = s2_ref[pl.program_id(0), 0].astype(jnp.float32)
    else:
        out_ref, = rest
    xall = x_ref[0]                            # (rows*ws, CW, C)
    cw = xall.shape[1]
    nw = cw // ws
    n = ws * ws
    ng, pn = nw // pack, pack * n
    dt = xall.dtype
    bias_all = bias_ref[...]

    for r in range(rows):
        x = xall[r * ws:(r + 1) * ws]
        bias_arr = (bias_all if broadcast_bias
                    else bias_all[:, r * ng:(r + 1) * ng])
        xw = _window_pack(x, ws, nw, pack, c)      # (T, C)
        xn, _, _ = _ln_forward(xw.astype(jnp.float32), lns_ref[0], lnb_ref[0])
        qkv = jax.lax.dot(xn.astype(dt), wqkv_ref[...],
                          preferred_element_type=jnp.float32) + bqkv_ref[0]
        a = _attention_heads(qkv.astype(dt).reshape(ng, pn, 3 * catt), bias_arr,
                             num_heads, catt, scale, broadcast_bias, dt)
        att = (jax.lax.dot(a.reshape(ng * pn, catt).astype(dt), wproj_ref[...],
                           preferred_element_type=jnp.float32) + bproj_ref[0])
        y = (att * s1 if scaled else att) + xw.astype(jnp.float32)
        yn, _, _ = _ln_forward(y, ln2s_ref[0], ln2b_ref[0])
        hpre = jax.lax.dot(yn.astype(dt), w1_ref[...],
                           preferred_element_type=jnp.float32) + b1_ref[0]
        mlp = jax.lax.dot(_gelu(hpre).astype(dt), w2_ref[...],
                          preferred_element_type=jnp.float32) + b2_ref[0]
        z = (mlp * s2 if scaled else mlp) + y
        out_ref[0, r * ws:(r + 1) * ws] = _window_unpack(
            z.astype(out_ref.dtype), ws, nw, cw, c)


def _kquant_int8(xf):
    """In-kernel per-tile dynamic symmetric int8 quantization of an f32
    activation tile. The tile is already resident in VMEM, so the absmax
    reduction is a cheap VPU pass — unlike the XLA-level dynamic quant in
    ops/quant.py it costs no extra HBM round trip and needs no calibration
    (and per-tile scales are tighter than any static per-tensor scale)."""
    amax = jnp.max(jnp.abs(xf))
    s = jnp.maximum(amax, 1e-12) * (1. / 127.)
    xq = jnp.clip(jnp.round(xf * (1. / s)), -127., 127.).astype(jnp.int8)
    return xq, s


def _joint_int8_fwd_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, sqkv_ref,
                           bqkv_ref, wproj_ref, sproj_ref, bproj_ref,
                           bias_ref, ln2s_ref, ln2b_ref, w1_ref, s1_ref,
                           b1_ref, w2_ref, s2_ref, b2_ref, out_ref, *, ws,
                           num_heads, c, catt, scale, broadcast_bias, pack,
                           rows=1):
    """W8A8 serving variant of ``_joint_fwd_kernel`` (VERDICT r3 #2): the
    four big GEMMs (qkv, proj, fc1, fc2) run int8 x int8 -> int32 on the MXU
    (1.64x the bf16 rate on v5e) with per-output-channel weight scales
    (s*_ref rows, computed at trace time) and per-tile dynamic activation
    scales. LN, softmax, GELU, residuals and the attention dots stay in
    f32/bf16 — reference attention: swinir_arch.py:95-193."""
    xall = x_ref[0]                            # (rows*ws, CW, C)
    cw = xall.shape[1]
    nw = cw // ws
    n = ws * ws
    ng, pn = nw // pack, pack * n
    dt = xall.dtype
    bias_all = bias_ref[...]

    for r in range(rows):
        x = xall[r * ws:(r + 1) * ws]
        bias_arr = (bias_all if broadcast_bias
                    else bias_all[:, r * ng:(r + 1) * ng])
        xw = _window_pack(x, ws, nw, pack, c)      # (T, C)
        xn, _, _ = _ln_forward(xw.astype(jnp.float32), lns_ref[0], lnb_ref[0])
        xq, sx = _kquant_int8(xn)
        qkv = (jax.lax.dot(xq, wqkv_ref[...],
                           preferred_element_type=jnp.int32)
               .astype(jnp.float32) * (sx * sqkv_ref[0]) + bqkv_ref[0])
        a = _attention_heads(qkv.astype(dt).reshape(ng, pn, 3 * catt), bias_arr,
                             num_heads, catt, scale, broadcast_bias, dt)
        aq, sa = _kquant_int8(a.reshape(ng * pn, catt).astype(jnp.float32))
        y = (jax.lax.dot(aq, wproj_ref[...],
                         preferred_element_type=jnp.int32)
             .astype(jnp.float32) * (sa * sproj_ref[0]) + bproj_ref[0]
             + xw.astype(jnp.float32))             # attn branch + residual
        yn, _, _ = _ln_forward(y, ln2s_ref[0], ln2b_ref[0])
        yq, sy = _kquant_int8(yn)
        hpre = (jax.lax.dot(yq, w1_ref[...],
                            preferred_element_type=jnp.int32)
                .astype(jnp.float32) * (sy * s1_ref[0]) + b1_ref[0])
        from .mlp_block import _gelu
        hq, sh = _kquant_int8(_gelu(hpre))
        z = (jax.lax.dot(hq, w2_ref[...],
                         preferred_element_type=jnp.int32)
             .astype(jnp.float32) * (sh * s2_ref[0]) + b2_ref[0] + y)
        out_ref[0, r * ws:(r + 1) * ws] = _window_unpack(
            z.astype(out_ref.dtype), ws, nw, cw, c)


def _block_bwd_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref,
                      bias_ref, dz_ref, *rest, ws, num_heads, c,
                      catt, scale, broadcast_bias, pack, add_residual,
                      scaled=False):
    from jax.experimental import pallas as pl

    if scaled:
        (s_ref, dx_ref, dlns_ref, dlnb_ref, dwqkv_ref, dbqkv_ref,
         dwproj_ref, dbproj_ref, dbias_ref) = rest
    else:
        (dx_ref, dlns_ref, dlnb_ref, dwqkv_ref, dbqkv_ref,
         dwproj_ref, dbproj_ref, dbias_ref) = rest
    x = x_ref[0]                               # (ws, CW, C)
    dz = dz_ref[0]
    cw = x.shape[1]
    nw = cw // ws
    n = ws * ws
    hd = catt // num_heads
    ng, pn = nw // pack, pack * n
    t = ng * pn
    dt = x.dtype

    # accumulating outputs: zero on the global first visit (constant-index
    # blocks stay resident across the whole sequential grid); dbias blocks
    # are per-(row,chunk) for shift masks -> zero at batch==0 (minormost)
    first_all = jnp.logical_and(
        jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0),
        pl.program_id(2) == 0)
    first_batch = pl.program_id(2) == 0

    @pl.when(first_all)
    def _init_weight_grads():
        dlns_ref[...] = jnp.zeros_like(dlns_ref)
        dlnb_ref[...] = jnp.zeros_like(dlnb_ref)
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dwproj_ref[...] = jnp.zeros_like(dwproj_ref)
        dbproj_ref[...] = jnp.zeros_like(dbproj_ref)

    @pl.when(first_all if broadcast_bias else first_batch)
    def _init_dbias():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    # ---- recompute forward up to the attention probabilities
    xw = _window_pack(x, ws, nw, pack, c)
    xf = xw.astype(jnp.float32)
    lns = lns_ref[0]
    xn, mu, inv = _ln_forward(xf, lns, lnb_ref[0])
    xn_dt = xn.astype(dt)
    qkv = (jax.lax.dot(xn_dt, wqkv_ref[...],
                       preferred_element_type=jnp.float32) + bqkv_ref[0])
    qkv3 = qkv.astype(dt).reshape(ng, pn, 3 * catt)

    dz_res = _window_pack(dz, ws, nw, pack, c).astype(jnp.float32)  # (T, C)
    # the branch cotangent carries the per-sample DropPath scale; the
    # residual cotangent dz_res stays unscaled
    dz_w = (dz_res * s_ref[pl.program_id(2), 0].astype(jnp.float32)
            if scaled else dz_res)

    # ---- recompute attention probs ONCE (shared by proj bwd + softmax VJP);
    # GEMM inputs stay in the model dtype with f32 accumulation — the same
    # mixed-precision convention as _mlp_bwd_kernel (bf16 runs the MXU at
    # full rate on v5e; when the caller trains in f32 dt==f32 and numerics
    # are unchanged, which the grad-parity tests pin)
    q, k, v = _split_heads(qkv3, num_heads, catt)     # (ng*heads, pn, hd')
    p, _ = _attention_probs(qkv3, bias_ref[...], num_heads, catt, scale,
                            broadcast_bias)           # f32 probs
    p_dt = p.astype(dt)

    # ---- proj backward (attention output rebuilt from the shared probs)
    o = jax.lax.dot_general(p_dt, v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    a = jnp.concatenate([o[h * ng:(h + 1) * ng] for h in range(num_heads)],
                        axis=-1).reshape(t, catt)
    dz_w_dt = dz_w.astype(dt)
    dwproj_ref[...] += jax.lax.dot_general(
        a.astype(dt), dz_w_dt, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbproj_ref[0] += jnp.sum(dz_w, axis=0)
    da = jax.lax.dot_general(dz_w_dt, wproj_ref[...],
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)   # (T, C')
    da3 = da.reshape(ng, pn, catt)

    # ---- attention backward, all heads batched (softmax VJP on shared P)
    # head-major axis-0 concat, like _split_heads (no lane-dim shape casts)
    do = jnp.concatenate([da3[:, :, h * hd:(h + 1) * hd]
                          for h in range(num_heads)], axis=0)   # f32
    do_dt = do.astype(dt)

    dv = jax.lax.dot_general(p_dt, do_dt, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do_dt, v, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds_dt = ds.astype(dt)
    dq = scale * jax.lax.dot_general(ds_dt, k, (((2,), (1,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32)
    dk = scale * jax.lax.dot_general(ds_dt, q, (((1,), (1,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32)
    ds4 = ds.reshape(num_heads, ng, pn, pn)
    if broadcast_bias:
        dbias_ref[...] += jnp.sum(ds4, axis=1, keepdims=True)
    else:
        dbias_ref[...] += ds4

    def merge(g):  # (heads*ng, pn, hd) head-major -> (t, c)
        return jnp.concatenate(
            [g[h * ng:(h + 1) * ng].reshape(t, hd) for h in range(num_heads)],
            axis=-1)

    dqkv = jnp.concatenate([merge(dq), merge(dk), merge(dv)], axis=-1)
    dqkv_dt = dqkv.astype(dt)

    # ---- qkv GEMM backward
    dwqkv_ref[...] += jax.lax.dot_general(
        xn_dt, dqkv_dt, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbqkv_ref[0] += jnp.sum(dqkv, axis=0)
    dxn = jax.lax.dot_general(dqkv_dt, wqkv_ref[...],
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # (T, C)

    # ---- LayerNorm backward
    xhat = (xf - mu) * inv
    dlns_ref[0] += jnp.sum(dxn * xhat, axis=0)
    dlnb_ref[0] += jnp.sum(dxn, axis=0)
    dxhat = dxn * lns
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = inv * (dxhat - m1 - xhat * m2)
    if add_residual or scaled:
        dx = dx + dz_res
    dx_ref[0] = _window_unpack(dx.astype(dx_ref.dtype), ws, nw, cw, c)


# ------------------------------------------------------------- dispatch
def fused_swin_attn_block(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                          bias, window_size: int, num_heads: int, scale: float,
                          interpret: bool = False, add_residual: bool = False,
                          residual_scale=None):
    """Fused LN1+qkv+window-attention+proj branch; XLA fallback off-TPU.

    Args:
      x: (B, H, W, C) feature map, already shifted for SW-MSA.
      ln_scale, ln_bias: (C,) LayerNorm affine.
      wqkv: (C, 3C); bqkv: (3C,); wproj: (C, C); bproj: (C,).
      bias: (nWb, heads, n, n) rel-pos bias (+ shift mask), nWb in {1, nW}.
      residual_scale: optional per-sample (B,) DropPath scale (mask/keep) —
        folds ``x + s*branch`` into the kernel (training stochastic depth
        without the XLA mask/residual round trips).
    Returns: (B, H, W, C) — the attention branch WITHOUT the residual (with
      it when ``add_residual`` or ``residual_scale``).
    """
    from . import dispatch
    interpret = interpret or dispatch.interpret_forced()

    def _reference(xx):
        out = reference_swin_attn_block(xx, ln_scale, ln_bias, wqkv, bqkv,
                                        wproj, bproj, bias, window_size,
                                        num_heads, scale)
        if residual_scale is not None:
            return xx + out * residual_scale[:, None, None, None].astype(xx.dtype)
        return xx + out if add_residual else out

    if not interpret and jax.default_backend() not in ('tpu',):
        return _reference(x)
    args = (x, ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32),
            wqkv, bqkv.astype(jnp.float32), wproj, bproj.astype(jnp.float32),
            bias.astype(jnp.float32))

    mesh, data, spatial = dispatch.mesh_info()
    if mesh is not None:
        # multi-device: per-shard kernel under shard_map; contract in
        # dispatch.window_shard_specs.
        from jax.sharding import PartitionSpec as P
        b, h, w, _ = x.shape
        nwb = bias.shape[0]
        specs = dispatch.window_shard_specs(data, spatial, b, h, w,
                                            window_size, nwb)
        if specs is None:
            return _reference(x)
        xspec, bias_spec = specs
        if residual_scale is not None:
            core = functools.partial(_fused_block_scaled_vjp, window_size,
                                     num_heads, scale, interpret)
            fn = dispatch.shard_wrap(
                core, mesh,
                in_specs=(xspec,) + (P(),) * 6 + (bias_spec, P('data')),
                out_specs=xspec)
            return fn(*args, residual_scale.astype(jnp.float32))
        core = functools.partial(_fused_block_vjp, window_size, num_heads,
                                 scale, interpret, add_residual)
        fn = dispatch.shard_wrap(
            core, mesh, in_specs=(xspec,) + (P(),) * 6 + (bias_spec,),
            out_specs=xspec)
        return fn(*args)

    if residual_scale is not None:
        return _fused_block_scaled_vjp(window_size, num_heads, scale,
                                       interpret, *args,
                                       residual_scale.astype(jnp.float32))
    return _fused_block_vjp(window_size, num_heads, scale, interpret,
                            add_residual, *args)


def _pack_cap() -> int:
    """Experiment knob: max packed-attention tile width (SWIN_PACK_CAP)."""
    import os
    return int(os.environ.get('SWIN_PACK_CAP', '128'))


def joint_block_enabled() -> bool:
    """Whether the arch may route eval through the single-call joint
    attn+MLP kernel (SWIN_JOINT=0 to fall back to the two-kernel split)."""
    import os
    return os.environ.get('SWIN_JOINT', '1') != '0'


def joint_train_enabled() -> bool:
    """Whether TRAINING also routes through the joint kernel. Default off:
    the joint VJP's flash-style attention recompute costs more than the
    split path's HBM round trip at SwinIR-M train shapes — measured
    same-session A/B at B24x64px on v5e: joint 6.49 MP/s (MFU 0.161) vs
    split 7.30 MP/s (MFU 0.182). See docs/Performance.md. SWIN_JOINT_TRAIN=1
    to experiment at other geometries."""
    import os
    return os.environ.get('SWIN_JOINT_TRAIN', '0') == '1'


def _head_loop() -> bool:
    """Experiment knob: per-head static loop instead of the axis-0
    head-concat batched attention (SWIN_HEAD_LOOP=1)."""
    import os
    return os.environ.get('SWIN_HEAD_LOOP', '0') == '1'


def _geometry(x, window_size, num_heads, bwd=True, hidden=0):
    b, h, w, c = x.shape
    ws, n = window_size, window_size * window_size
    pack = _pack_factor(n, w // ws, _pack_cap())
    cw = _chunk_cols(w, ws, pack, c, num_heads, bwd=bwd, hidden=hidden)
    return b, h, w, c, ws, n, pack, cw


def _bias_block(bias_p_shape, num_heads, pn, ng_chunk, w_chunks, order):
    """BlockSpec for the HEAD-MAJOR packed bias (heads, nWb, pn, pn) under a
    3D grid. order='fwd' -> grid (b, j, wc); order='bwd' -> grid (j, wc, b)."""
    from jax.experimental import pallas as pl
    broadcast = bias_p_shape[1] == 1
    if broadcast:
        return pl.BlockSpec((num_heads, 1, pn, pn), lambda *_: (0, 0, 0, 0)), True
    if order == 'fwd':
        return pl.BlockSpec((num_heads, ng_chunk, pn, pn),
                            lambda bi, j, wc: (0, j * w_chunks + wc, 0, 0)), False
    return pl.BlockSpec((num_heads, ng_chunk, pn, pn),
                        lambda j, wc, bi: (0, j * w_chunks + wc, 0, 0)), False


def _const_spec(shape, ndim_grid=3):
    from jax.experimental import pallas as pl
    return pl.BlockSpec(shape, lambda *_: (0,) * len(shape))


def _row_batch(w_chunks, h, ws, cw, c, num_heads, pn, hidden=0):
    """Window-rows per forward grid step (full-width chunks only): fewer,
    bigger grid cells amortize per-step overhead; rows are independent so
    the kernel just loops them with the right per-row bias slice. The
    budget caps the per-step VMEM working set (activations, scores,
    and — for the joint kernel — the MLP hidden). Swept on v5e at the
    SwinIR-M headline shape (B8 64px): the joint eval kernel (hidden>0)
    wants rows=1 (6 MB: 22.5-22.8 MP/s vs 22.4-22.5 at 12 MB / rows=2;
    >=24 MB / rows=4 exceeds the 16 MB scoped-VMEM hardware limit and
    fails to compile), while the split attention kernel that training
    runs (hidden=0, smaller working set) wants rows=2 (10 MB: 5.99 MP/s
    train step vs 5.87 at rows=1) — so the default budget differs per
    kernel; SWIN_ROW_BUDGET_MB overrides both."""
    import os
    default = '6' if hidden else '10'
    budget = float(os.environ.get('SWIN_ROW_BUDGET_MB', default)) * 1e6
    rows = 1
    if w_chunks == 1:
        nwh = h // ws
        per_token = c * 4 * 3 + num_heads * pn * 4 * 2 + hidden * 4 * 2
        for cand in range(2, nwh + 1):
            if nwh % cand == 0 and cand * ws * cw * per_token <= budget:
                rows = cand
    return rows


def _fused_block_forward(window_size, num_heads, scale, interpret,
                         add_residual, x, ln_scale, ln_bias, wqkv, bqkv,
                         wproj, bproj, bias, s=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # forward-specific chunk sizing (the backward's working set is ~2.5x
    # larger; sizing the forward by it would halve the chunk width and
    # double the grid-step overhead)
    b, h, w, c, ws, n, pack, cw = _geometry(x, window_size, num_heads,
                                            bwd=False)
    hd = c // num_heads
    hdp = _padded_hd(hd)
    catt = num_heads * hdp
    if hdp != hd:
        wqkv, bqkv, wproj = _pad_head_weights(wqkv, bqkv, wproj, num_heads,
                                              hd, hdp)
    w_chunks = w // cw
    ng, pn = (cw // ws) // pack, pack * n
    rows = _row_batch(w_chunks, h, ws, cw, c, num_heads, pn)
    bias_p = _pack_bias(bias, pack, n).transpose(1, 0, 2, 3)  # head-major
    bias_spec, broadcast_bias = _bias_block(bias_p.shape, num_heads, pn,
                                            rows * ng, w_chunks, 'fwd')
    kernel = functools.partial(_block_fwd_kernel, ws=ws, num_heads=num_heads,
                               c=c, catt=catt, scale=scale,
                               broadcast_bias=broadcast_bias,
                               pack=pack, add_residual=add_residual, rows=rows,
                               scaled=s is not None)
    in_specs = [
        pl.BlockSpec((1, rows * ws, cw, c), lambda bi, j, wc: (bi, j, wc, 0)),
        _const_spec((1, c)), _const_spec((1, c)),
        _const_spec((c, 3 * catt)), _const_spec((1, 3 * catt)),
        _const_spec((catt, c)), _const_spec((1, c)),
        bias_spec,
    ]
    args = [x, ln_scale[None], ln_bias[None], wqkv.astype(x.dtype), bqkv[None],
            wproj.astype(x.dtype), bproj[None], bias_p]
    if s is not None:
        in_specs.append(pl.BlockSpec((b, 1), lambda bi, j, wc: (0, 0)))
        args.append(s.reshape(-1, 1).astype(jnp.float32))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b, h // (ws * rows), w_chunks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, rows * ws, cw, c),
                               lambda bi, j, wc: (bi, j, wc, 0)),
        # every forward grid cell is independent — let Mosaic reorder and
        # pipeline freely
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'parallel')),
        interpret=interpret,
    )(*args)


def _fused_block_backward(window_size, num_heads, scale, interpret,
                          add_residual, x, ln_scale, ln_bias, wqkv, bqkv,
                          wproj, bias, dz, s=None):
    from jax.experimental import pallas as pl

    b, h, w, c, ws, n, pack, cw = _geometry(x, window_size, num_heads)
    hd = c // num_heads
    hdp = _padded_hd(hd)
    catt = num_heads * hdp
    wdt_qkv, wdt_proj = wqkv.dtype, wproj.dtype
    if hdp != hd:
        wqkv, bqkv, wproj = _pad_head_weights(wqkv, bqkv, wproj, num_heads,
                                              hd, hdp)
    w_chunks = w // cw
    ng, pn = (cw // ws) // pack, pack * n
    bias_p = _pack_bias(bias, pack, n).transpose(1, 0, 2, 3)  # head-major
    bias_spec, broadcast_bias = _bias_block(bias_p.shape, num_heads, pn, ng,
                                            w_chunks, 'bwd')
    kernel = functools.partial(_block_bwd_kernel, ws=ws, num_heads=num_heads,
                               c=c, catt=catt, scale=scale,
                               broadcast_bias=broadcast_bias,
                               pack=pack, add_residual=add_residual,
                               scaled=s is not None)
    strip = pl.BlockSpec((1, ws, cw, c), lambda j, wc, bi: (bi, j, wc, 0))
    f32 = jnp.float32
    in_specs = [
        strip,
        _const_spec((1, c)), _const_spec((1, c)),
        _const_spec((c, 3 * catt)), _const_spec((1, 3 * catt)),
        _const_spec((catt, c)),
        bias_spec,
        strip,
    ]
    args = [x, ln_scale[None], ln_bias[None], wqkv.astype(x.dtype), bqkv[None],
            wproj.astype(x.dtype), bias_p, dz]
    if s is not None:
        in_specs.append(pl.BlockSpec((b, 1), lambda j, wc, bi: (0, 0)))
        args.append(s.reshape(-1, 1).astype(jnp.float32))
    dx, dlns, dlnb, dwqkv, dbqkv, dwproj, dbproj, dbias_p = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct((1, c), f32),
                   jax.ShapeDtypeStruct((1, c), f32),
                   jax.ShapeDtypeStruct((c, 3 * catt), f32),
                   jax.ShapeDtypeStruct((1, 3 * catt), f32),
                   jax.ShapeDtypeStruct((catt, c), f32),
                   jax.ShapeDtypeStruct((1, c), f32),
                   jax.ShapeDtypeStruct(bias_p.shape, f32)),
        grid=(h // ws, w_chunks, b),
        in_specs=in_specs,
        out_specs=(strip,
                   _const_spec((1, c)), _const_spec((1, c)),
                   _const_spec((c, 3 * catt)), _const_spec((1, 3 * catt)),
                   _const_spec((catt, c)), _const_spec((1, c)),
                   bias_spec),
        interpret=interpret,
    )(*args)
    if hdp != hd:
        # drop the zero-lane padding from the weight cotangents
        dwqkv = dwqkv.reshape(c, 3, num_heads, hdp)[..., :hd].reshape(c, 3 * c)
        dbqkv = dbqkv.reshape(3, num_heads, hdp)[..., :hd].reshape(1, 3 * c)
        dwproj = dwproj.reshape(num_heads, hdp, c)[:, :hd].reshape(c, c)
    dbias = _unpack_dbias(dbias_p.transpose(1, 0, 2, 3), pack, n, bias.shape[0])
    return (dx, dlns[0], dlnb[0], dwqkv.astype(wdt_qkv), dbqkv[0],
            dwproj.astype(wdt_proj), dbproj[0], dbias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _fused_block_vjp(window_size, num_heads, scale, interpret, add_residual,
                     x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias):
    return _fused_block_forward(window_size, num_heads, scale, interpret,
                                add_residual, x, ln_scale, ln_bias, wqkv,
                                bqkv, wproj, bproj, bias)


def _vjp_fwd(window_size, num_heads, scale, interpret, add_residual, x,
             ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias):
    out = _fused_block_forward(window_size, num_heads, scale, interpret,
                               add_residual, x, ln_scale, ln_bias, wqkv, bqkv,
                               wproj, bproj, bias)
    return out, (x, ln_scale, ln_bias, wqkv, bqkv, wproj, bias)


def _vjp_bwd(window_size, num_heads, scale, interpret, add_residual, res, dz):
    x, ln_scale, ln_bias, wqkv, bqkv, wproj, bias = res
    dx, dlns, dlnb, dwqkv, dbqkv, dwproj, dbproj, dbias = _fused_block_backward(
        window_size, num_heads, scale, interpret, add_residual, x, ln_scale,
        ln_bias, wqkv, bqkv, wproj, bias, dz.astype(x.dtype))
    return dx, dlns, dlnb, dwqkv, dbqkv, dwproj, dbproj, dbias


_fused_block_vjp.defvjp(_vjp_fwd, _vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _fused_block_scaled_vjp(window_size, num_heads, scale, interpret, x,
                            ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                            bias, s):
    """x + s * attn_branch(x) with the per-sample DropPath scale s (B,)
    folded into the kernels. s is a random mask — zero cotangent."""
    return _fused_block_forward(window_size, num_heads, scale, interpret,
                                False, x, ln_scale, ln_bias, wqkv, bqkv,
                                wproj, bproj, bias, s=s)


def _scaled_vjp_fwd(window_size, num_heads, scale, interpret, x, ln_scale,
                    ln_bias, wqkv, bqkv, wproj, bproj, bias, s):
    out = _fused_block_forward(window_size, num_heads, scale, interpret,
                               False, x, ln_scale, ln_bias, wqkv, bqkv,
                               wproj, bproj, bias, s=s)
    return out, (x, ln_scale, ln_bias, wqkv, bqkv, wproj, bias, s)


def _scaled_vjp_bwd(window_size, num_heads, scale, interpret, res, dz):
    x, ln_scale, ln_bias, wqkv, bqkv, wproj, bias, s = res
    dx, dlns, dlnb, dwqkv, dbqkv, dwproj, dbproj, dbias = \
        _fused_block_backward(window_size, num_heads, scale, interpret,
                              False, x, ln_scale, ln_bias, wqkv, bqkv, wproj,
                              bias, dz.astype(x.dtype), s=s)
    return (dx, dlns, dlnb, dwqkv, dbqkv, dwproj, dbproj, dbias,
            jnp.zeros_like(s))


_fused_block_scaled_vjp.defvjp(_scaled_vjp_fwd, _scaled_vjp_bwd)


# --------------------------------------------------- joint attn+MLP block
def _fused_joint_forward(window_size, num_heads, scale, interpret, x,
                         ln1s, ln1b, wqkv, bqkv, wproj, bproj, bias,
                         ln2s, ln2b, w1, b1, w2, b2, s1=None, s2=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    hidden = w1.shape[1]
    b, h, w, c, ws, n, pack, cw = _geometry(x, window_size, num_heads,
                                            bwd=False, hidden=hidden)
    hd = c // num_heads
    hdp = _padded_hd(hd)
    catt = num_heads * hdp
    if hdp != hd:
        wqkv, bqkv, wproj = _pad_head_weights(wqkv, bqkv, wproj, num_heads,
                                              hd, hdp)
    w_chunks = w // cw
    ng, pn = (cw // ws) // pack, pack * n
    rows = _row_batch(w_chunks, h, ws, cw, c, num_heads, pn, hidden=hidden)
    bias_p = _pack_bias(bias, pack, n).transpose(1, 0, 2, 3)  # head-major
    bias_spec, broadcast_bias = _bias_block(bias_p.shape, num_heads, pn,
                                            rows * ng, w_chunks, 'fwd')
    kernel = functools.partial(_joint_fwd_kernel, ws=ws, num_heads=num_heads,
                               c=c, catt=catt, scale=scale,
                               broadcast_bias=broadcast_bias,
                               pack=pack, rows=rows, scaled=s1 is not None)
    in_specs = [
        pl.BlockSpec((1, rows * ws, cw, c), lambda bi, j, wc: (bi, j, wc, 0)),
        _const_spec((1, c)), _const_spec((1, c)),
        _const_spec((c, 3 * catt)), _const_spec((1, 3 * catt)),
        _const_spec((catt, c)), _const_spec((1, c)),
        bias_spec,
        _const_spec((1, c)), _const_spec((1, c)),
        _const_spec((c, hidden)), _const_spec((1, hidden)),
        _const_spec((hidden, c)), _const_spec((1, c)),
    ]
    args = [x, ln1s[None], ln1b[None], wqkv.astype(x.dtype), bqkv[None],
            wproj.astype(x.dtype), bproj[None], bias_p,
            ln2s[None], ln2b[None], w1.astype(x.dtype), b1[None],
            w2.astype(x.dtype), b2[None]]
    if s1 is not None:
        for s in (s1, s2):
            in_specs.append(pl.BlockSpec((b, 1), lambda bi, j, wc: (0, 0)))
            args.append(s.reshape(-1, 1).astype(jnp.float32))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b, h // (ws * rows), w_chunks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, rows * ws, cw, c),
                               lambda bi, j, wc: (bi, j, wc, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'parallel')),
        interpret=interpret,
    )(*args)


def _fused_joint_int8_forward(window_size, num_heads, scale, interpret, x,
                              ln1s, ln1b, wqkv, bqkv, wproj, bproj, bias,
                              ln2s, ln2b, w1, b1, w2, b2):
    """W8A8 joint block (serving only — no VJP; the quant path never routes
    under grad). Weights are quantized per-output-channel at trace time
    (hoisted/shared across blocks by XLA CSE when params are the same)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .quant import quantize_weight_int8

    hidden = w1.shape[1]
    b, h, w, c, ws, n, pack, cw = _geometry(x, window_size, num_heads,
                                            bwd=False, hidden=hidden)
    hd = c // num_heads
    hdp = _padded_hd(hd)
    catt = num_heads * hdp
    if hdp != hd:
        wqkv, bqkv, wproj = _pad_head_weights(wqkv, bqkv, wproj, num_heads,
                                              hd, hdp)
    wqkv_q, sqkv = quantize_weight_int8(wqkv.astype(jnp.float32), (0,))
    wproj_q, sproj = quantize_weight_int8(wproj.astype(jnp.float32), (0,))
    w1_q, s1 = quantize_weight_int8(w1.astype(jnp.float32), (0,))
    w2_q, s2 = quantize_weight_int8(w2.astype(jnp.float32), (0,))
    w_chunks = w // cw
    ng, pn = (cw // ws) // pack, pack * n
    rows = _row_batch(w_chunks, h, ws, cw, c, num_heads, pn, hidden=hidden)
    bias_p = _pack_bias(bias, pack, n).transpose(1, 0, 2, 3)  # head-major
    bias_spec, broadcast_bias = _bias_block(bias_p.shape, num_heads, pn,
                                            rows * ng, w_chunks, 'fwd')
    kernel = functools.partial(_joint_int8_fwd_kernel, ws=ws,
                               num_heads=num_heads, c=c, catt=catt,
                               scale=scale, broadcast_bias=broadcast_bias,
                               pack=pack, rows=rows)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b, h // (ws * rows), w_chunks),
        in_specs=[
            pl.BlockSpec((1, rows * ws, cw, c), lambda bi, j, wc: (bi, j, wc, 0)),
            _const_spec((1, c)), _const_spec((1, c)),
            _const_spec((c, 3 * catt)), _const_spec((1, 3 * catt)),
            _const_spec((1, 3 * catt)),
            _const_spec((catt, c)), _const_spec((1, c)), _const_spec((1, c)),
            bias_spec,
            _const_spec((1, c)), _const_spec((1, c)),
            _const_spec((c, hidden)), _const_spec((1, hidden)),
            _const_spec((1, hidden)),
            _const_spec((hidden, c)), _const_spec((1, c)), _const_spec((1, c)),
        ],
        out_specs=pl.BlockSpec((1, rows * ws, cw, c),
                               lambda bi, j, wc: (bi, j, wc, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'parallel')),
        interpret=interpret,
    )(x, ln1s[None], ln1b[None], wqkv_q, sqkv[None], bqkv[None],
      wproj_q, sproj[None], bproj[None], bias_p,
      ln2s[None], ln2b[None], w1_q, s1[None], b1[None],
      w2_q, s2[None], b2[None])


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _fused_joint_vjp(window_size, num_heads, scale, interpret, x,
                     ln1s, ln1b, wqkv, bqkv, wproj, bproj, bias,
                     ln2s, ln2b, w1, b1, w2, b2):
    return _fused_joint_forward(window_size, num_heads, scale, interpret, x,
                                ln1s, ln1b, wqkv, bqkv, wproj, bproj, bias,
                                ln2s, ln2b, w1, b1, w2, b2)


def _joint_vjp_fwd(window_size, num_heads, scale, interpret, x,
                   ln1s, ln1b, wqkv, bqkv, wproj, bproj, bias,
                   ln2s, ln2b, w1, b1, w2, b2):
    out = _fused_joint_forward(window_size, num_heads, scale, interpret, x,
                               ln1s, ln1b, wqkv, bqkv, wproj, bproj, bias,
                               ln2s, ln2b, w1, b1, w2, b2)
    return out, (x, ln1s, ln1b, wqkv, bqkv, wproj, bproj, bias,
                 ln2s, ln2b, w1, b1, w2)


def _joint_vjp_bwd(window_size, num_heads, scale, interpret, res, dz):
    """Flash-style: recompute the post-attention activation y with the attn
    forward kernel, then run the two existing backward kernels (MLP then
    attention), each with the residual folded."""
    from .mlp_block import _mlp_backward

    (x, ln1s, ln1b, wqkv, bqkv, wproj, bproj, bias,
     ln2s, ln2b, w1, b1, w2) = res
    c = x.shape[-1]
    y = _fused_block_forward(window_size, num_heads, scale, interpret, True,
                             x, ln1s, ln1b, wqkv, bqkv, wproj, bproj, bias)
    dy2, dln2s, dln2b, dw1, db1, dw2, db2 = _mlp_backward(
        interpret, True, y.reshape(-1, c), ln2s, ln2b, w1, b1, w2,
        dz.reshape(-1, c).astype(y.dtype))
    dx, dln1s, dln1b, dwqkv, dbqkv, dwproj, dbproj, dbias = \
        _fused_block_backward(window_size, num_heads, scale, interpret, True,
                              x, ln1s, ln1b, wqkv, bqkv, wproj, bias,
                              dy2.reshape(x.shape))
    return (dx, dln1s, dln1b, dwqkv, dbqkv, dwproj, dbproj, dbias,
            dln2s, dln2b, dw1, db1, dw2, db2)


_fused_joint_vjp.defvjp(_joint_vjp_fwd, _joint_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _fused_joint_scaled_vjp(window_size, num_heads, scale, interpret, x,
                            ln1s, ln1b, wqkv, bqkv, wproj, bproj, bias,
                            ln2s, ln2b, w1, b1, w2, b2, s1, s2):
    """Whole block with per-sample DropPath scales folded:
    y = x + s1*attn(x); out = y + s2*mlp(y). s1/s2 are random masks — zero
    cotangents. Training analog of ``_fused_joint_vjp``."""
    return _fused_joint_forward(window_size, num_heads, scale, interpret, x,
                                ln1s, ln1b, wqkv, bqkv, wproj, bproj, bias,
                                ln2s, ln2b, w1, b1, w2, b2, s1=s1, s2=s2)


def _joint_scaled_fwd(window_size, num_heads, scale, interpret, x,
                      ln1s, ln1b, wqkv, bqkv, wproj, bproj, bias,
                      ln2s, ln2b, w1, b1, w2, b2, s1, s2):
    out = _fused_joint_forward(window_size, num_heads, scale, interpret, x,
                               ln1s, ln1b, wqkv, bqkv, wproj, bproj, bias,
                               ln2s, ln2b, w1, b1, w2, b2, s1=s1, s2=s2)
    return out, (x, ln1s, ln1b, wqkv, bqkv, wproj, bproj, bias,
                 ln2s, ln2b, w1, b1, w2, s1, s2)


def _joint_scaled_bwd(window_size, num_heads, scale, interpret, res, dz):
    """Flash-style: recompute y = x + s1*attn(x) with the scaled attention
    forward kernel, then run the two existing scaled backward kernels
    (MLP with per-token s2, attention with per-batch s1)."""
    from .mlp_block import _mlp_backward

    (x, ln1s, ln1b, wqkv, bqkv, wproj, bproj, bias,
     ln2s, ln2b, w1, b1, w2, s1, s2) = res
    b = x.shape[0]
    c = x.shape[-1]
    tokens_per_sample = x.size // (b * c)
    y = _fused_block_forward(window_size, num_heads, scale, interpret, False,
                             x, ln1s, ln1b, wqkv, bqkv, wproj, bproj, bias,
                             s=s1)
    s2_tok = jnp.repeat(s2.astype(jnp.float32), tokens_per_sample)[:, None]
    dy2, dln2s, dln2b, dw1, db1, dw2, db2 = _mlp_backward(
        interpret, False, y.reshape(-1, c), ln2s, ln2b, w1, b1, w2,
        dz.reshape(-1, c).astype(y.dtype), s2=s2_tok)
    dx, dln1s, dln1b, dwqkv, dbqkv, dwproj, dbproj, dbias = \
        _fused_block_backward(window_size, num_heads, scale, interpret, False,
                              x, ln1s, ln1b, wqkv, bqkv, wproj, bias,
                              dy2.reshape(x.shape), s=s1)
    return (dx, dln1s, dln1b, dwqkv, dbqkv, dwproj, dbproj, dbias,
            dln2s, dln2b, dw1, db1, dw2, db2,
            jnp.zeros_like(s1), jnp.zeros_like(s2))


_fused_joint_scaled_vjp.defvjp(_joint_scaled_fwd, _joint_scaled_bwd)


def fused_swin_block_full(x, ln1_scale, ln1_bias, wqkv, bqkv, wproj, bproj,
                          bias, ln2_scale, ln2_bias, w1, b1, w2, b2,
                          window_size: int, num_heads: int, scale: float,
                          interpret: bool = False, quant_int8: bool = False,
                          residual_scales=None):
    """The WHOLE Swin block — attention branch + residual + MLP branch +
    residual — in one Pallas call (the caller owns the shift roll /
    roll-back, which commutes with the per-token MLP). Reference structure:
    swinir_arch.py:194-262 (attn + Mlp with residual adds). Returns
    (B, H, W, C), same dtype as x.

    ``residual_scales``: optional (s1, s2) per-sample (B,) DropPath scales —
    training stochastic depth folded into the kernel:
    y = x + s1*attn(x); out = y + s2*mlp(y). Without them both DropPaths
    must be identity.
    ``quant_int8``: serving mode — the qkv/proj/fc1/fc2 GEMMs run W8A8 on
    the int8 MXU (see ``_joint_int8_fwd_kernel``); no VJP."""
    from . import dispatch
    interpret = interpret or dispatch.interpret_forced()
    if quant_int8:
        joint_fn = _fused_joint_int8_forward
    elif residual_scales is not None:
        joint_fn = _fused_joint_scaled_vjp
    else:
        joint_fn = _fused_joint_vjp
    args = (x, ln1_scale.astype(jnp.float32), ln1_bias.astype(jnp.float32),
            wqkv, bqkv.astype(jnp.float32), wproj, bproj.astype(jnp.float32),
            bias.astype(jnp.float32),
            ln2_scale.astype(jnp.float32), ln2_bias.astype(jnp.float32),
            w1, b1.astype(jnp.float32), w2, b2.astype(jnp.float32))
    if residual_scales is not None and not quant_int8:
        s1, s2 = residual_scales
        args = args + (s1.astype(jnp.float32), s2.astype(jnp.float32))

    def _reference(xx):
        att = reference_swin_attn_block(
            xx, ln1_scale, ln1_bias, wqkv, bqkv, wproj, bproj, bias,
            window_size, num_heads, scale)
        from .mlp_block import reference_mlp_block
        if residual_scales is not None:
            s1, s2 = residual_scales
            y = xx + att * s1[:, None, None, None].astype(xx.dtype)
            return y + (reference_mlp_block(y, ln2_scale, ln2_bias, w1, b1,
                                            w2, b2)
                        * s2[:, None, None, None].astype(xx.dtype))
        y = xx + att
        return y + reference_mlp_block(y, ln2_scale, ln2_bias, w1, b1, w2, b2)

    if not interpret and jax.default_backend() not in ('tpu',):
        return _reference(x)

    mesh, data, spatial = dispatch.mesh_info()
    if mesh is not None:
        # same sharding contract as fused_swin_attn_block
        # (dispatch.window_shard_specs).
        from jax.sharding import PartitionSpec as P
        b, h, w, _ = x.shape
        nwb = bias.shape[0]
        specs = dispatch.window_shard_specs(data, spatial, b, h, w,
                                            window_size, nwb)
        if specs is None:
            return _reference(x)
        xspec, bias_spec = specs
        core = functools.partial(joint_fn, window_size, num_heads,
                                 scale, interpret)
        in_specs = (xspec,) + (P(),) * 6 + (bias_spec,) + (P(),) * 6
        if residual_scales is not None and not quant_int8:
            # s1/s2 follow the batch axis of x
            in_specs = in_specs + (P(xspec[0]), P(xspec[0]))
        fn = dispatch.shard_wrap(core, mesh, in_specs=in_specs,
                                 out_specs=xspec)
        return fn(*args)

    return joint_fn(window_size, num_heads, scale, interpret, *args)
