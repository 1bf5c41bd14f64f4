"""Modulated deformable convolution (DCNv2), TPU-native.

Replaces the reference's hand-written CUDA extension
(reference: basicsr/ops/dcn/src/deform_conv_cuda_kernel.cu:191-696 and the
autograd wrappers in ops/dcn/deform_conv.py:121-374). Three interchangeable
bilinear samplers sit behind one API:

- **Pallas fused sampler** (TPU default when the per-group feature slab fits
  VMEM): all K*K taps per DCN_BP-pixel tile with the slab VMEM-resident;
  bilinear weights are hat functions relu(1-|pos-idx|) (row interpolation as
  an MXU matmul, column interpolation a VPU reduction), with hand-written
  forward AND backward kernels behind a custom VJP. 2x the one-hot
  formulation on training steps, 378x the gather formulation.
- **one-hot matmul** (TPU fallback for large slabs): per-pixel bilinear sampling is two
  separable interpolations — a row-interpolation matrix ``R (P, H)`` with two
  nonzeros per row applied on the MXU (``R @ X``), then a column
  interpolation as a small VPU reduction. No gather, no scatter: forward AND
  backward (autodiff: more matmuls) stay on the matrix unit. XLA's gather /
  scatter-add lowering on TPU is near-serial for small slices — measured
  78 ms fwd / 11 s fwd+bwd at EDVR sizes vs ~ms for this formulation.
- **patch gather** (CPU default): one ``lax.gather`` per tap fetching 2x2
  bilinear patches — on CPU backends gathers are memcpy-cheap and the
  one-hot matmul's O(P*H*W*C) FLOPs would be the slow path.

Autodiff produces the input/offset/mask/weight gradients (the scatter-add
col2im of the reference) for free in both formulations; for the one-hot path
the offset gradient flows through the interpolation weights, which is exactly
the analytic bilinear gradient. A Pallas fused sampler can slot in behind the
same API later.

Layout: NHWC activations, HWIO weights. Offset/mask channel semantics match
torch exactly — offset channels ``g*(2*K*K) + 2*k + {0: dy, 1: dx}``, mask
channels ``g*K*K + k`` — so converted checkpoints behave identically.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils.registry import ARCH_REGISTRY


def _bilinear_gather_padded(xp: jnp.ndarray, py: jnp.ndarray, px: jnp.ndarray) -> jnp.ndarray:
    """Sample a ZERO-PADDED map xp (N, H+2, W+2, C) at float positions py/px
    (N, Ho, Wo) given in unpadded coordinates; zeros outside.

    One ``lax.gather`` per call fetching the whole 2x2 bilinear patch —
    gather cost is per-index, so this is ~4x cheaper than gathering the four
    corners separately. Fast on CPU; on TPU XLA lowers it near-serially
    (use the one-hot sampler there — see scripts/bench_dcn.py)."""
    n, hp, wp, c = xp.shape
    h, w = hp - 2, wp - 2
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy = (py - y0)[..., None].astype(xp.dtype)
    wx = (px - x0)[..., None].astype(xp.dtype)

    # padded start of the 2x2 patch; the pad ring supplies exact zeros for
    # samples within 1px of the border, the mask kills fully-outside samples
    sy = jnp.clip(y0 + 1, 0, h).astype(jnp.int32)
    sx = jnp.clip(x0 + 1, 0, w).astype(jnp.int32)
    inside = ((py > -1) & (py < h) & (px > -1) & (px < w))[..., None]

    ho, wo = py.shape[1:]
    batch = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None, None], (n, ho, wo))
    starts = jnp.stack([batch, sy, sx], axis=-1).reshape(n * ho * wo, 3)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(0,), start_index_map=(0, 1, 2))
    patch = jax.lax.gather(xp, starts, dnums, slice_sizes=(1, 2, 2, c),
                           mode=jax.lax.GatherScatterMode.CLIP)
    patch = patch.reshape(n, ho, wo, 2, 2, c)

    top = patch[..., 0, 0, :] * (1 - wx) + patch[..., 0, 1, :] * wx
    bot = patch[..., 1, 0, :] * (1 - wx) + patch[..., 1, 1, :] * wx
    return (top * (1 - wy) + bot * wy) * inside.astype(xp.dtype)


def _bilinear_onehot_padded(xp: jnp.ndarray, py: jnp.ndarray, px: jnp.ndarray) -> jnp.ndarray:
    """Same contract as :func:`_bilinear_gather_padded`, expressed as two
    separable one-hot interpolations so all the work lands on the MXU/VPU.

    ``R[p, h] = (1-fy)*1{h==y0} + fy*1{h==y0+1}`` selects-and-interpolates
    rows via one batched matmul ``T = R @ X``; the column interpolation is the
    analogous two-nonzero reduction over ``T``. The zero pad ring supplies
    border zeros and ``inside`` kills fully-outside samples — bit-identical
    to the gather path under exact f32 arithmetic (on TPU the matmul runs at
    the platform's default precision, like every conv in the framework).
    """
    n, hp, wp, c = xp.shape
    h, w = hp - 2, wp - 2
    ho, wo = py.shape[1:]
    p = ho * wo
    py = py.reshape(n, p)
    px = px.reshape(n, p)
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    fy = (py - y0)[..., None].astype(xp.dtype)
    fx = (px - x0)[..., None].astype(xp.dtype)
    iy = jnp.clip(y0 + 1, 0, hp - 2).astype(jnp.int32)[..., None]
    ix = jnp.clip(x0 + 1, 0, wp - 2).astype(jnp.int32)[..., None]
    inside = ((py > -1) & (py < h) & (px > -1) & (px < w))[..., None]

    hh = jnp.arange(hp, dtype=jnp.int32)
    rsel = ((hh == iy).astype(xp.dtype) * (1 - fy)
            + (hh == iy + 1).astype(xp.dtype) * fy)        # (n, p, hp)
    t = jnp.einsum('gph,ghwc->gpwc', rsel, xp)             # MXU row interp
    wwv = jnp.arange(wp, dtype=jnp.int32)
    csel = ((wwv == ix).astype(xp.dtype) * (1 - fx)
            + (wwv == ix + 1).astype(xp.dtype) * fx)       # (n, p, wp)
    out = jnp.einsum('gpw,gpwc->gpc', csel, t)             # VPU col interp
    return (out * inside.astype(xp.dtype)).reshape(n, ho, wo, c)


def _sampler(method: str):
    if method == 'auto':
        method = 'gather' if jax.default_backend() == 'cpu' else 'onehot'
    return _bilinear_onehot_padded if method == 'onehot' else _bilinear_gather_padded


# ---------------------------------------------------------------------------
# Pallas fused sampler: all K*K taps per DCN_BP-pixel tile with the feature slab
# resident in VMEM. Bilinear weights are hat functions relu(1 - |pos - idx|),
# which — together with the zero pad ring — reproduce zero-padding border
# semantics with no clipping or inside-mask at all. Row interpolation is an
# MXU matmul (R @ X), column interpolation a VPU product reduced back to
# channels by a 0/1 matmul. Replaces the reference im2col CUDA kernel
# (deform_conv_cuda_kernel.cu:191) at ~matmul speed; see scripts/bench_dcn.py.
# ---------------------------------------------------------------------------

def _bp() -> int:
    """Pixels per grid cell (env DCN_BP). On-chip probes at EDVR shapes
    measured 128/256/512 identical within noise (the sampler is bound by
    per-pixel-tap VPU/VMEM traffic — docs/Performance.md r5 protocol
    note); 512 is kept as the default for the larger MXU M-dim and fewer
    grid iterations, clamped per-geometry by :func:`_bp_for`."""
    import os
    return int(os.environ.get('DCN_BP', '512'))



def _bp_for(wp: int, cpg: int) -> int:
    """Clamp the pixels-per-cell to keep the kernels' stacked (bp, WC)
    f32 intermediates (~6 live in the backward) inside a ~12 MB VMEM
    budget at wide geometries — the 4 MB slab gate alone does not bound
    the per-tile working set (code-review r5)."""
    wc_pad = -(-(wp * cpg) // 128) * 128
    budget_rows = (12 * 1024 * 1024) // (wc_pad * 4 * 6)
    return max(128, min(_bp(), budget_rows // 128 * 128))


def _tap_chunks(k2: int, which: str, bp: int) -> int:
    """Taps stacked per MXU call. Stacking turns per-tap (bp, HP) hat
    matmuls into one (tc*bp, HP) matmul — fewer MXU dispatches per cell.
    The stacked working set holds several (tc*bp, WC) f32 intermediates,
    so the row budget is capped (~1152 rows fwd / ~384 bwd at the EDVR
    WC=640 geometry fits comfortably in VMEM). Env knobs
    DCN_TAP_CHUNK_FWD / _BWD override for experiments."""
    import os
    cap = {'fwd': 1152, 'bwd': 384}[which]
    d = max(1, min(k2, cap // bp))
    tc = int(os.environ.get(f'DCN_TAP_CHUNK_{which.upper()}', str(d)))
    tc = max(1, min(tc, k2))
    while k2 % tc:
        tc -= 1
    return tc


def _dcn_pallas_fwd_kernel(k2: int, cpg: int, tc: int, bp: int, win: int = 0):
    from jax.experimental import pallas as pl

    def kernel(x_ref, pos_ref, *rest):
        # windowed variant (win>0): contract only the `win`-row slab
        # [rb, rb+win) around this tile's samples (rb from the SMEM plan
        # array, 8-aligned; the caller's lax.cond guarantees coverage)
        if win:
            rb_ref, out_ref = rest
            rb = pl.multiple_of(rb_ref[pl.program_id(0), pl.program_id(1)], 8)
            x = x_ref[0, pl.ds(rb, win), :]
        else:
            out_ref, = rest
            rb = 0
            x = x_ref[0]                                     # (HP, WC)
        # bf16 inputs keep the hat matmuls in bf16 (f32 accumulation): the
        # MXU runs bf16 at a multiple of the f32 rate and hat weights in
        # [0, 1] lose only 2^-9 relative — the same rounding every nn.Conv
        # applies to its inputs under dtype=bfloat16. f32 inputs keep the
        # exact f32 path (bit-parity with the gather/onehot samplers).
        mdt = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
        x = x.astype(mdt)
        hp, wc = x.shape
        h_iota = (jax.lax.broadcasted_iota(jnp.int32, (bp, hp), 1)
                  + rb).astype(jnp.float32)
        w_of_lane = (jax.lax.broadcasted_iota(jnp.int32, (bp, wc), 1)
                     // cpg).astype(jnp.float32)
        # 0/1 fold matrix: lane l contributes to channel l % cpg
        sfold = (jax.lax.broadcasted_iota(jnp.int32, (wc, cpg), 0) % cpg ==
                 jax.lax.broadcasted_iota(jnp.int32, (wc, cpg), 1)).astype(mdt)
        for k0 in range(0, k2, tc):
            rs, cws = [], []
            for k in range(k0, k0 + tc):
                pyy = pos_ref[0, :, 2 * k:2 * k + 1].astype(jnp.float32)  # (BP, 1)
                pxx = pos_ref[0, :, 2 * k + 1:2 * k + 2].astype(jnp.float32)
                rs.append(jnp.maximum(0., 1. - jnp.abs(h_iota - pyy)))    # (BP, HP)
                cws.append(jnp.maximum(0., 1. - jnp.abs(w_of_lane - pxx)))
            r_all = jnp.concatenate(rs, axis=0)                           # (tc*BP, HP)
            cw_all = jnp.concatenate(cws, axis=0)                         # (tc*BP, WC)
            t_all = jnp.dot(r_all.astype(mdt), x,
                            preferred_element_type=jnp.float32)
            tap_all = jnp.dot((t_all * cw_all).astype(mdt), sfold,
                              preferred_element_type=jnp.float32)         # (tc*BP, cpg)
            for i in range(tc):
                out_ref[0, k0 + i] = (
                    tap_all[i * bp:(i + 1) * bp].T.astype(out_ref.dtype))

    return kernel


def _dcn_pallas_bwd_kernel(k2: int, cpg: int, hp_true: int, wp_true: int,
                           tc: int, bp: int, win: int = 0):
    from jax.experimental import pallas as pl

    def kernel(x_ref, *rest):
        # same bf16-matmul convention as the forward kernel (gradients
        # accumulate in f32 output blocks either way)
        mdt = x_ref.dtype if x_ref.dtype == jnp.bfloat16 else jnp.float32
        if win:
            # windowed: no transposed-slab input (dr contracts the lane dim
            # of the window slab directly); dx accumulates into the full-
            # height accumulator through a dynamic row slice
            pos_ref, g_ref, rb_ref, dx_ref, dpos_ref = rest
            rb = pl.multiple_of(rb_ref[pl.program_id(0), pl.program_id(1)], 8)
            x = x_ref[0, pl.ds(rb, win), :].astype(mdt)      # (win, WC)
            xt = None
        else:
            xt_ref, pos_ref, g_ref, dx_ref, dpos_ref = rest
            rb = 0
            x = x_ref[0].astype(mdt)                         # (HP, WC)
            xt = xt_ref[0].astype(mdt)                       # (WC, HP)
        hp, wc = x.shape
        hp_full = x_ref.shape[1]
        h_iota = (jax.lax.broadcasted_iota(jnp.int32, (bp, hp), 1)
                  + rb).astype(jnp.float32)
        w_of_lane = (jax.lax.broadcasted_iota(jnp.int32, (bp, wc), 1)
                     // cpg).astype(jnp.float32)
        sfold_t = (jax.lax.broadcasted_iota(jnp.int32, (cpg, wc), 1) % cpg ==
                   jax.lax.broadcasted_iota(jnp.int32, (cpg, wc), 0)).astype(mdt)
        dx_acc = jnp.zeros((hp_full, wc), jnp.float32) if not win else None
        dx_win_acc = jnp.zeros((win, wc), jnp.float32) if win else None
        for k0 in range(0, k2, tc):
            # stack tc taps: one dot each for dprod/t/dx/dr instead of one
            # per tap (see _tap_chunks)
            rs, cws, dys, dws, dtaps = [], [], [], [], []
            for k in range(k0, k0 + tc):
                pyy = pos_ref[0, :, 2 * k:2 * k + 1].astype(jnp.float32)
                pxx = pos_ref[0, :, 2 * k + 1:2 * k + 2].astype(jnp.float32)
                dys.append(h_iota - pyy)
                dws.append(w_of_lane - pxx)
                rs.append(jnp.maximum(0., 1. - jnp.abs(dys[-1])))
                cws.append(jnp.maximum(0., 1. - jnp.abs(dws[-1])))
                dtaps.append(g_ref[0, k].astype(mdt).T)                   # (BP, cpg)
            r_all = jnp.concatenate(rs, axis=0).astype(mdt)               # (tc*BP, HP)
            cw_all = jnp.concatenate(cws, axis=0)
            dy_all = jnp.concatenate(dys, axis=0)
            dw_all = jnp.concatenate(dws, axis=0)
            dtap_all = jnp.concatenate(dtaps, axis=0)
            t_all = jnp.dot(r_all, x, preferred_element_type=jnp.float32)  # (tc*BP, WC)
            dprod_all = jnp.dot(dtap_all, sfold_t,
                                preferred_element_type=jnp.float32)
            dt_all = dprod_all * cw_all
            dcw_all = dprod_all * t_all
            # dx += r^T @ dt, contracted over the stacked-row axis
            dx_part = jax.lax.dot_general(
                r_all, dt_all.astype(mdt), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if win:
                dx_win_acc = dx_win_acc + dx_part
                # dr = dt @ x^T via lane-dim contraction of the window slab
                # (no transposed input needed)
                dr_all = jax.lax.dot_general(
                    dt_all.astype(mdt), x, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)                   # (tc*BP, win)
            else:
                dx_acc = dx_acc + dx_part
                dr_all = jnp.dot(dt_all.astype(mdt), xt,
                                 preferred_element_type=jnp.float32)      # (tc*BP, HP)
            # d hat(d)/d pos, FLOOR convention: one-sided at integer
            # positions so the gradient matches the gather/onehot bilinear
            # paths (d out/d p = v[floor(p)+1] - v[floor(p)]). The naive
            # sign(d) on |d| < 1 is identically zero at integer positions —
            # and DCNv2Pack zero-inits its offset conv, so offsets would
            # never train (ADVICE r2, high).
            gy = jnp.where((dy_all > 0.) & (dy_all <= 1.), 1.,
                           jnp.where((dy_all > -1.) & (dy_all <= 0.), -1., 0.))
            gx = jnp.where((dw_all > 0.) & (dw_all <= 1.), 1.,
                           jnp.where((dw_all > -1.) & (dw_all <= 0.), -1., 0.))
            dpy_all = jnp.sum(dr_all * gy, axis=1, keepdims=True)         # (tc*BP, 1)
            dpx_all = jnp.sum(dcw_all * gx, axis=1, keepdims=True)
            for i, k in enumerate(range(k0, k0 + tc)):
                pyy = pos_ref[0, :, 2 * k:2 * k + 1].astype(jnp.float32)
                pxx = pos_ref[0, :, 2 * k + 1:2 * k + 2].astype(jnp.float32)
                # the gather/onehot paths zero the position gradient when
                # the sample sits ON or outside the border (their `inside`
                # mask is the open interval); match that convention (padded
                # coords: valid iff pos in (0, hp_true-1))
                vy = ((pyy > 0.) & (pyy < hp_true - 1.)).astype(jnp.float32)
                vx = ((pxx > 0.) & (pxx < wp_true - 1.)).astype(jnp.float32)
                dpos_ref[0, :, 2 * k:2 * k + 1] = (
                    dpy_all[i * bp:(i + 1) * bp] * vy).astype(dpos_ref.dtype)
                dpos_ref[0, :, 2 * k + 1:2 * k + 2] = (
                    dpx_all[i * bp:(i + 1) * bp] * vx).astype(dpos_ref.dtype)

        if win:
            @pl.when(pl.program_id(1) == 0)
            def _():
                dx_ref[0] = jnp.zeros(dx_ref.shape[1:], dx_ref.dtype)
            cur = dx_ref[0, pl.ds(rb, win), :]
            dx_ref[0, pl.ds(rb, win), :] = cur + dx_win_acc.astype(dx_ref.dtype)
        else:
            @pl.when(pl.program_id(1) == 0)
            def _():
                dx_ref[0] = dx_acc.astype(dx_ref.dtype)

            @pl.when(pl.program_id(1) != 0)
            def _():
                dx_ref[0] = dx_ref[0] + dx_acc.astype(dx_ref.dtype)

    return kernel


def _pallas_pack(xg_pad, pos, k2, cpg, bp):
    """Shared shape plumbing for the fwd/bwd pallas calls. Returns padded
    operands plus the grid/block machinery inputs."""
    g, hp, wp, _ = xg_pad.shape
    p = pos.shape[1]
    hp_pad = -(-hp // 8) * 8
    wc = wp * cpg
    wc_pad = -(-wc // 128) * 128
    p_pad = -(-p // bp) * bp
    x2 = jnp.pad(xg_pad.reshape(g, hp, wc),
                 ((0, 0), (0, hp_pad - hp), (0, wc_pad - wc)))
    # EDGE padding: padded pixels' outputs/grad-columns are sliced off /
    # zero, so any value is correct — edge replication keeps the per-tile
    # row min/max (the windowed path's block selector) undistorted.
    pos_p = jnp.pad(pos, ((0, 0), (0, p_pad - p), (0, 0)), mode='edge')
    return x2, pos_p, hp_pad, wc_pad, p_pad


def _row_window() -> int:
    """Height of the windowed sampler's row slab (DCN_ROW_WINDOW, 0=off).

    The hat-function row-interp matmul runs over the FULL padded height —
    but a pixel tile spans only a few image rows, and trained DCN offsets
    are a few pixels, so per tile the hat matrix is nonzero in a narrow row
    band. The windowed kernels compute each tile's band start (8-aligned,
    from the per-tile position min) trace-side and contract only ``win``
    rows — with a lax.cond falling back to the full-height kernels whenever
    ANY tile's tap span exceeds the window, so semantics are identical.

    DEFAULT OFF: on-chip A/B at EDVR shapes measured it neutral (109 vs
    115 ms sites — the sampler is VPU/VMEM-traffic-bound, not matmul-width
    -bound; docs/Performance.md r5 protocol note), while the cond compiles
    TWO Mosaic kernel pairs per DCN site, roughly doubling the video
    models' already-long compile. Set DCN_ROW_WINDOW=24 to enable at
    geometries with much larger H. Values round UP to a multiple of 8 —
    the window-start plan is 8-aligned and the kernels promise Mosaic
    8-aligned slab loads (pl.multiple_of)."""
    import os
    win = int(os.environ.get('DCN_ROW_WINDOW', '0'))
    return -(-win // 8) * 8 if win > 0 else 0


def _row_window_plan(pos_p, g, t, k2, hp_pad, win, bp):
    """Per-tile 8-aligned row-window starts (G, T) i32 plus a scalar 'every
    tile fits' predicate. Needed rows for a sample at position p are
    {floor(p), floor(p)+1} clipped to the existing [0, hp_pad) range."""
    py = pos_p[..., 0::2].reshape(g, t, bp, k2)
    fmin = jnp.clip(jnp.floor(py.min(axis=(2, 3))), 0., hp_pad - 1.)
    fmax = jnp.clip(jnp.floor(py.max(axis=(2, 3))) + 1., 0., hp_pad - 1.)
    rb = jnp.clip((fmin // 8.) * 8., 0., float(max(hp_pad - win, 0)))
    fits = jnp.all(fmax - rb <= win - 1)
    return rb.astype(jnp.int32), fits


def _sample_all_pallas_impl(xg_pad, pos, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g, hp, wp, cpg = xg_pad.shape
    p, k2 = pos.shape[1], pos.shape[2] // 2
    bp = _bp_for(wp, cpg)
    x2, pos_p, hp_pad, wc_pad, p_pad = _pallas_pack(xg_pad, pos, k2, cpg, bp)
    tiles = p_pad // bp
    out_shape = jax.ShapeDtypeStruct((g, k2, cpg, p_pad), xg_pad.dtype)
    out_spec = pl.BlockSpec((1, k2, cpg, bp), lambda gi, pi: (gi, 0, 0, pi))
    base_specs = [
        pl.BlockSpec((1, hp_pad, wc_pad), lambda gi, pi: (gi, 0, 0)),
        pl.BlockSpec((1, bp, 2 * k2), lambda gi, pi: (gi, pi, 0)),
    ]

    def full():
        return pl.pallas_call(
            _dcn_pallas_fwd_kernel(k2, cpg, _tap_chunks(k2, 'fwd', bp), bp),
            grid=(g, tiles),
            in_specs=base_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(x2, pos_p)

    win = _row_window()
    if not win or hp_pad <= win:
        return full()[..., :p]
    rb, fits = _row_window_plan(pos_p, g, tiles, k2, hp_pad, win, bp)

    def windowed():
        return pl.pallas_call(
            _dcn_pallas_fwd_kernel(k2, cpg, _tap_chunks(k2, 'fwd', bp), bp,
                                   win=win),
            grid=(g, tiles),
            in_specs=base_specs + [
                pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(x2, pos_p, rb)

    out = jax.lax.cond(fits, windowed, full)
    return out[..., :p]                                      # (G, K2, cpg, P)


def _sample_all_pallas_bwd_impl(xg_pad, pos, grad, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g, hp, wp, cpg = xg_pad.shape
    p, k2 = pos.shape[1], pos.shape[2] // 2
    bp = _bp_for(wp, cpg)
    x2, pos_p, hp_pad, wc_pad, p_pad = _pallas_pack(xg_pad, pos, k2, cpg, bp)
    tiles = p_pad // bp
    grad_p = jnp.pad(grad.astype(xg_pad.dtype), ((0, 0), (0, 0), (0, 0), (0, p_pad - p)))
    x_spec = pl.BlockSpec((1, hp_pad, wc_pad), lambda gi, pi: (gi, 0, 0))
    pos_spec = pl.BlockSpec((1, bp, 2 * k2), lambda gi, pi: (gi, pi, 0))
    g_spec = pl.BlockSpec((1, k2, cpg, bp), lambda gi, pi: (gi, 0, 0, pi))
    out_specs = [
        pl.BlockSpec((1, hp_pad, wc_pad), lambda gi, pi: (gi, 0, 0)),
        pl.BlockSpec((1, bp, 2 * k2), lambda gi, pi: (gi, pi, 0)),
    ]
    out_shape = [
        # dx accumulates across pixel-tile grid revisits — keep the
        # accumulator f32 (a serial bf16 accumulation would lose input-
        # gradient precision vs the f32 onehot/gather paths; ADVICE r2)
        # and cast to the input dtype once after the call.
        jax.ShapeDtypeStruct((g, hp_pad, wc_pad), jnp.float32),
        jax.ShapeDtypeStruct((g, p_pad, 2 * k2), pos.dtype),
    ]

    def full():
        xt = jnp.swapaxes(x2, 1, 2)
        return pl.pallas_call(
            _dcn_pallas_bwd_kernel(k2, cpg, hp, wp,
                                   _tap_chunks(k2, 'bwd', bp), bp),
            grid=(g, tiles),
            in_specs=[x_spec,
                      pl.BlockSpec((1, wc_pad, hp_pad), lambda gi, pi: (gi, 0, 0)),
                      pos_spec, g_spec],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(x2, xt, pos_p, grad_p)

    win = _row_window()
    if not win or hp_pad <= win:
        dx, dpos = full()
    else:
        rb, fits = _row_window_plan(pos_p, g, tiles, k2, hp_pad, win, bp)

        def windowed():
            return pl.pallas_call(
                _dcn_pallas_bwd_kernel(k2, cpg, hp, wp,
                                       _tap_chunks(k2, 'bwd', bp), bp,
                                       win=win),
                grid=(g, tiles),
                in_specs=[x_spec, pos_spec, g_spec,
                          pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_specs=out_specs,
                out_shape=out_shape,
                interpret=interpret,
            )(x2, pos_p, grad_p, rb)

        dx, dpos = jax.lax.cond(fits, windowed, full)
    wc = wp * cpg
    dx = dx[:, :hp, :wc].reshape(g, hp, wp, cpg).astype(xg_pad.dtype)
    return dx, dpos[:, :p]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _sample_all_pallas(xg_pad, pos, interpret=False):
    """Sample all K*K taps: xg_pad (G, Hp, Wp, cpg) zero-padded by 1, pos
    (G, P, 2*K2) interleaved padded-coordinate (y, x) per tap. Returns
    (G, K2, cpg, P)."""
    return _sample_all_pallas_impl(xg_pad, pos, interpret)


def _sample_all_pallas_fwd(xg_pad, pos, interpret):
    return _sample_all_pallas_impl(xg_pad, pos, interpret), (xg_pad, pos)


def _sample_all_pallas_bwd(interpret, res, grad):
    xg_pad, pos = res
    return _sample_all_pallas_bwd_impl(xg_pad, pos, grad, interpret)


_sample_all_pallas.defvjp(_sample_all_pallas_fwd, _sample_all_pallas_bwd)


def bilinear_warp(x: jnp.ndarray, py: jnp.ndarray, px: jnp.ndarray,
                  border: bool = False) -> Optional[jnp.ndarray]:
    """Dense bilinear warp via the fused Pallas hat-function sampler — the
    TPU fast path for ``arch_util.flow_warp`` (one tap, deform-group = the
    whole channel dim). XLA lowers ``lax.gather`` near-serially on TPU and
    its backward is a scatter-add (measured 32 ms fwd+bwd per warp at
    BasicVSR++ train shapes vs ~1 ms here — the single largest cost in the
    recurrent video train step, reference basicvsrpp_arch.py:186-235).

    Args:
      x: (N, H, W, C); py/px: (N, H, W) sample positions in unpadded coords.
      border: clamp-to-edge semantics instead of zeros.
    Returns (N, H, W, C), or None when this path cannot run (not on TPU,
    slab exceeds VMEM, or unshardable mesh geometry) — caller falls back.
    """
    from . import dispatch
    interpret = dispatch.interpret_forced()
    if not interpret and jax.default_backend() != 'tpu':
        return None
    n, h, w, c = x.shape
    mesh, mesh_data, mesh_spatial = dispatch.mesh_info()
    if mesh is not None and not (mesh_spatial == 1 and n % mesh_data == 0):
        return None
    # per-map slab must fit VMEM (same budget as the DCN auto dispatch)
    slab = (-(-(h + 2) // 8) * 8) * (-(-((w + 2) * c) // 128) * 128) * 4
    if slab > 4 * 1024 * 1024:
        return None
    if border:
        py = jnp.clip(py, 0., h - 1.)
        px = jnp.clip(px, 0., w - 1.)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    pos = jnp.stack([py + 1., px + 1.], axis=-1).reshape(n, h * w, 2)
    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        fn = dispatch.shard_wrap(
            lambda a, p: _sample_all_pallas(a, p, interpret), mesh,
            in_specs=(P('data'), P('data')), out_specs=P('data'))
        out = fn(xp, pos.astype(jnp.float32))
    else:
        out = _sample_all_pallas(xp, pos.astype(jnp.float32), interpret)
    # (N, 1, C, P) -> (N, H, W, C)
    return out[:, 0].transpose(0, 2, 1).reshape(n, h, w, c)


def modulated_deform_conv(x: jnp.ndarray,
                          offset: jnp.ndarray,
                          mask: Optional[jnp.ndarray],
                          weight: jnp.ndarray,
                          bias: Optional[jnp.ndarray] = None,
                          stride: int = 1,
                          padding: int = 1,
                          dilation: int = 1,
                          groups: int = 1,
                          deform_groups: int = 1,
                          method: str = 'auto') -> jnp.ndarray:
    """DCNv2 forward (v1 when ``mask`` is None).

    Args:
        x: (N, H, W, Cin).
        offset: (N, Ho, Wo, 2*dg*kh*kw), torch channel layout.
        mask: (N, Ho, Wo, dg*kh*kw) in [0, 1], or None.
        weight: (kh, kw, Cin//groups, Cout).
        method: 'pallas' (fused VMEM-resident sampler, custom VJP),
            'onehot' (MXU one-hot matmul sampling), 'gather' (lax.gather
            2x2 patches), or 'auto' (gather on CPU; on TPU pallas when the
            per-group feature slab fits VMEM, onehot otherwise —
            gathers/scatters are near-serial on TPU).
    """
    n, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    dg = deform_groups
    cpg = cin // dg  # channels per deform group

    off = offset.reshape(n, ho, wo, dg, kh * kw, 2)
    msk = None if mask is None else mask.reshape(n, ho, wo, dg, kh * kw)

    base_y = jax.lax.broadcasted_iota(jnp.float32, (ho, wo), 0) * stride - padding
    base_x = jax.lax.broadcasted_iota(jnp.float32, (ho, wo), 1) * stride - padding

    x_g = x.reshape(n, h, w, dg, cpg)
    xg = x_g.transpose(0, 3, 1, 2, 4).reshape(n * dg, h, w, cpg)
    # zero ring once: supplies exact zeros for border-adjacent samples
    xg_pad = jnp.pad(xg, ((0, 0), (1, 1), (1, 1), (0, 0)))

    from . import dispatch
    mesh, mesh_data, mesh_spatial = dispatch.mesh_info()
    # the fused sampler shards its fused (N*dg) leading dim over 'data'
    # under shard_map; a spatially-sharded H would need halo exchange the
    # kernel doesn't do -> one-hot (XLA partitions its einsums)
    mesh_shardable = (mesh is None
                      or (mesh_spatial == 1 and (n * dg) % mesh_data == 0))

    if method == 'auto':
        if dispatch.interpret_forced():
            method = 'pallas_interpret' if mesh_shardable else 'onehot'
        elif jax.default_backend() == 'cpu':
            method = 'gather'
        elif not mesh_shardable:
            method = 'onehot'   # pure-XLA: SPMD-partitionable on any mesh
        else:
            # per-group slab must fit VMEM for the fused kernel
            slab = (-(-(h + 2) // 8) * 8) * (-(-((w + 2) * cpg) // 128) * 128) * 4
            method = 'pallas' if slab <= 4 * 1024 * 1024 else 'onehot'

    if method in ('pallas', 'pallas_interpret'):
        if mesh is not None and not mesh_shardable:
            # an explicit pallas request that cannot be shard_map'ed would
            # emit an opaque un-partitionable pallas_call into the sharded
            # step — fail loudly instead ('auto' routes to onehot here)
            raise ValueError(
                f"method='{method}' requested under a multi-device mesh "
                f'(data={mesh_data}, spatial={mesh_spatial}) that the fused '
                f'sampler cannot shard: requires spatial=1 and (batch*deform_'
                f'groups)={n * dg} divisible by data. Use method="auto" or '
                f'"onehot".')
        # positions for every tap in padded coordinates, (G, P, 2*K2)
        ki = jnp.asarray([dilation * (k // kw) for k in range(kh * kw)], jnp.float32)
        kj = jnp.asarray([dilation * (k % kw) for k in range(kh * kw)], jnp.float32)
        pyy = base_y[None, :, :, None, None] + ki + off[..., 0] + 1.0
        pxx = base_x[None, :, :, None, None] + kj + off[..., 1] + 1.0
        pos = jnp.stack([pyy, pxx], axis=-1)            # (n, ho, wo, dg, k2, 2)
        pos = pos.transpose(0, 3, 1, 2, 4, 5).reshape(n * dg, ho * wo, 2 * kh * kw)
        interp = method == 'pallas_interpret'
        if mesh is not None and mesh_shardable:
            # shard the fused (N*dg) group dim over 'data': every operand is
            # batch-sharded, so no collectives are needed in either direction
            from jax.sharding import PartitionSpec as P
            sampler_fn = dispatch.shard_wrap(
                lambda xp, ps: _sample_all_pallas(xp, ps, interp), mesh,
                in_specs=(P('data'), P('data')), out_specs=P('data'))
            patches = sampler_fn(xg_pad, pos.astype(jnp.float32))
        else:
            patches = _sample_all_pallas(xg_pad, pos.astype(jnp.float32), interp)
        patches = patches.reshape(n, dg, kh * kw, cpg, ho, wo)
        sample = None
    else:
        sample = _sampler(method)
        patches = None

    cig = cin // groups
    cog = cout // groups
    wk = weight.reshape(kh * kw, cig, cout)
    wg = weight.reshape(kh * kw, cig, groups, cog) if groups > 1 else None

    if patches is not None and groups == 1:
        # The fused sampler already materialized every tap — contract all
        # K*K taps in ONE im2col GEMM (K-dim kh*kw*cin instead of kh*kw
        # separate cin-deep GEMMs: 9x fewer MXU dispatches and a K of 576
        # instead of 64 at EDVR sizes, where a 64-deep contraction leaves
        # half the 128-wide systolic array idle).
        col = patches.transpose(0, 4, 5, 2, 1, 3)  # (n, ho, wo, k2, dg, cpg)
        if msk is not None:
            col = col * msk.transpose(0, 1, 2, 4, 3)[..., None].astype(col.dtype)
        col = col.reshape(n, ho, wo, kh * kw * cin).astype(x.dtype)
        out = jax.lax.dot_general(
            col, weight.reshape(kh * kw * cin, cout).astype(x.dtype),
            (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)
        if bias is not None:
            out = out + bias.astype(out.dtype)
        return out

    # per-tap sample + accumulate into the output: the (N, Ho, Wo, K*K, Cin)
    # column tensor of an im2col formulation never materializes in the
    # gather/one-hot paths (~1/3 less HBM traffic); static K*K loop.
    out = jnp.zeros((n, ho, wo, cout), x.dtype)
    for k in range(kh * kw):
        i, j = divmod(k, kw)
        if patches is not None:
            sampled = patches[:, :, k].transpose(0, 3, 4, 1, 2).astype(x.dtype)
        else:
            # sample per deform group: fold dg into batch, one vectorized call
            py = (base_y[None, None] + i * dilation + off[..., k, 0].transpose(0, 3, 1, 2)).reshape(n * dg, ho, wo)
            px = (base_x[None, None] + j * dilation + off[..., k, 1].transpose(0, 3, 1, 2)).reshape(n * dg, ho, wo)
            sampled = sample(xg_pad, py, px).reshape(n, dg, ho, wo, cpg)
            sampled = sampled.transpose(0, 2, 3, 1, 4)  # (N, Ho, Wo, dg, cpg)
        if msk is not None:
            sampled = sampled * msk[..., k][..., None]
        if groups == 1:
            out = out + jnp.einsum('nhwc,co->nhwo', sampled.reshape(n, ho, wo, cin), wk[k])
        else:
            s = sampled.reshape(n, ho, wo, groups, cig)
            out = out + jnp.einsum('nhwgc,cgo->nhwgo', s, wg[k]).reshape(n, ho, wo, cout)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


class ModulatedDeformConvPack(nn.Module):
    """Offsets/masks from the *same* input (reference deform_conv.py:336-374)."""
    in_channels: int
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    groups: int = 1
    deformable_groups: int = 1
    use_bias: bool = True
    dtype: Any = None

    def _offset_conv(self, feat):
        k = self.kernel_size
        return nn.Conv(self.deformable_groups * 3 * k * k, (k, k),
                       strides=(self.stride, self.stride), padding=self.padding,
                       kernel_dilation=(self.dilation, self.dilation),
                       kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
                       dtype=self.dtype, name='conv_offset')(feat)

    def _dcn(self, x, offset, mask):
        k = self.kernel_size
        fan_in = self.in_channels * k * k
        stdv = 1. / math.sqrt(fan_in)
        weight = self.param('kernel',
                            lambda rng, shape: jax.random.uniform(rng, shape, jnp.float32, -stdv, stdv),
                            (k, k, self.in_channels // self.groups, self.out_channels))
        bias = (self.param('bias', nn.initializers.zeros, (self.out_channels,))
                if self.use_bias else None)
        return modulated_deform_conv(x, offset, mask, weight, bias, self.stride,
                                     self.padding, self.dilation, self.groups,
                                     self.deformable_groups)

    @nn.compact
    def __call__(self, x):
        out = self._offset_conv(x)
        o1, o2, mask = jnp.split(out, 3, axis=-1)
        offset = jnp.concatenate((o1, o2), axis=-1)
        mask = jax.nn.sigmoid(mask)
        return self._dcn(x, offset, mask)


@ARCH_REGISTRY.register()
class DCNv2Pack(ModulatedDeformConvPack):
    """Offsets/masks from a *separate* feature (reference arch_util.py:237-264);
    used by EDVR PCD alignment and IconVSR."""

    @nn.compact
    def __call__(self, x, feat):
        out = self._offset_conv(feat)
        o1, o2, mask = jnp.split(out, 3, axis=-1)
        offset = jnp.concatenate((o1, o2), axis=-1)
        mask = jax.nn.sigmoid(mask)
        # The reference warns when mean |offset| > 50 (arch_util.py:253-256);
        # a host-side warning is incompatible with jit, so the in-graph
        # replacement is a sown diagnostic: a no-op unless the caller applies
        # with mutable=['diagnostics'] (models expose it behind
        # train.log_dcn_offset and surface the max over all DCN sites).
        self.sow('diagnostics', 'dcn_offset_abs_mean',
                 jnp.abs(offset).mean().astype(jnp.float32))
        return self._dcn(x, offset, mask)
