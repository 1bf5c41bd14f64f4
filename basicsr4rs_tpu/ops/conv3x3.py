"""Fused 3x3 same-padding convolution for the SwinIR conv path.

XLA's NHWC conv at the transformer widths used here (C=180) measures ~17%
MFU on v5e (docs/Performance.md) — the implicit-GEMM tiling it picks for
narrow, not-128-aligned channel counts leaves the MXU idle. This op
expresses the conv as nine shifted (HW, C) x (C, C') matmuls accumulated
in f32 VMEM — per image, the whole padded activation lives in VMEM so the
nine taps re-read it for free (an XLA formulation of the same
decomposition materializes every shift in HBM and measured slower).

Reference counterpart: the plain ``nn.Conv`` layers of
``basicsr/archs/swinir_arch.py:694`` (conv_after_body / RSTB tail convs);
the fused residual add and leaky-relu epilogues mirror what the reference
leaves to torch eager.

The backward delegates to XLA's conv grads via a custom VJP (training
keeps its current backward cost; inference and the forward half of
training get the kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ['fused_conv3x3']

_F32 = jnp.float32


def _xla_conv3x3(x, w, b, residual, act_slope):
    """Reference/fallback path (XLA autodiff provides the backward)."""
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ('NHWC', 'HWIO', 'NHWC'))
    out = jax.lax.conv_general_dilated(x, w.astype(x.dtype), (1, 1),
                                       'SAME', dimension_numbers=dn)
    out = out + b.astype(out.dtype)
    if residual is not None:
        out = out + residual
    if act_slope is not None:
        out = jnp.where(out >= 0, out, jnp.asarray(act_slope, out.dtype) * out)
    return out


def _conv_kernel(xp_ref, w_ref, b_ref, *rest, hs, h, wd, cin, cout,
                 act_slope, has_res):
    """All nine taps as row-offset slices of the HW-flattened padded image.

    The padded image arrives flattened to ((h+2)*(wd+2), cin): a (dy, dx)
    tap is then rows [ (r+dy)*(wd+2)+dx : ... ] — a pure leading-dim slice
    with no sublane rotate (slicing the W axis of an (h, w, c) block moves
    the whole tile across sublanes, which is what made the unflattened
    formulation measure at XLA parity). Each output row computes wd+2
    columns, 2 of them garbage from row wrap-around, sliced off at the
    store."""
    if has_res:
        res_ref, out_ref = rest
    else:
        (out_ref,) = rest
    xf = xp_ref[0]                               # ((h+2)*(wd+2), cin)
    dt = out_ref.dtype
    wp = wd + 2
    for s in range(h // hs):
        m = hs * wp
        acc = jnp.broadcast_to(b_ref[0], (m, cout)).astype(_F32)
        for dy in range(3):
            for dx in range(3):
                base = (s * hs + dy) * wp + dx
                acc = acc + jax.lax.dot(xf[base:base + m],
                                        w_ref[dy * 3 + dx],
                                        preferred_element_type=_F32)
        out = acc.reshape(hs, wp, cout)[:, :wd]
        if has_res:
            out = out + res_ref[0, s * hs:(s + 1) * hs].astype(_F32)
        if act_slope is not None:
            out = jnp.where(out >= 0, out, _F32(act_slope) * out)
        out_ref[0, s * hs:(s + 1) * hs] = out.astype(dt)


def _strip_rows(h: int, wd: int, cout: int) -> int:
    """Largest strip height (divides h) whose f32 accumulator stays well
    under VMEM alongside the whole padded image (taps are free slices, so
    bigger strips only cost accumulator space)."""
    # 2 MB cap on the f32 accumulator: the acc + its reshape/slice/cast
    # temps are stack-scoped, and Mosaic's 16 MB scoped-vmem limit is
    # already ~10 MB consumed by the double-buffered image blocks at
    # SwinIR-M geometry (hs=64 measured 64K over the limit)
    budget = 2e6
    best = 1
    for cand in range(1, h + 1):
        if h % cand == 0 and cand * (wd + 2) * cout * 4 <= budget:
            best = cand
    return best


def _pallas_conv3x3(x, w, b, residual, act_slope, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, h, wd, cin = x.shape
    cout = w.shape[-1]
    hs = _strip_rows(h, wd, cout)
    # one extra bottom pad row: the last strip's (dy=2, dx=2) tap slice
    # runs 2 elements past (h+2)*(wd+2) in flat coords (the overrun only
    # feeds garbage columns, but the slice must stay in bounds)
    xp = jnp.pad(x, ((0, 0), (1, 2), (1, 1), (0, 0)))
    xp = xp.reshape(bsz, (h + 3) * (wd + 2), cin)
    w9 = w.reshape(9, cin, cout).astype(x.dtype)

    kernel = functools.partial(_conv_kernel, hs=hs, h=h, wd=wd, cin=cin,
                               cout=cout, act_slope=act_slope,
                               has_res=residual is not None)
    img = pl.BlockSpec((1, h, wd, cout), lambda bi: (bi, 0, 0, 0))
    in_specs = [
        pl.BlockSpec((1, (h + 3) * (wd + 2), cin), lambda bi: (bi, 0, 0)),
        pl.BlockSpec((9, cin, cout), lambda bi: (0, 0, 0)),
        pl.BlockSpec((1, cout), lambda bi: (0, 0)),
    ]
    args = [xp, w9, b.astype(_F32)[None]]
    if residual is not None:
        in_specs.append(img)
        args.append(residual)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, h, wd, cout), x.dtype),
        grid=(bsz,),
        in_specs=in_specs,
        out_specs=img,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel',)),
        interpret=interpret,
    )(*args)


def _grads(x, w, dz, out, act_slope):
    """XLA conv grads: dx via the flipped/IO-swapped kernel, dw via
    shifted contractions, db by reduction. leaky-relu is sign-preserving
    (slope > 0), so the output's own sign recovers the pre-activation
    sign — nothing extra saved."""
    dzf = dz.astype(_F32)
    if act_slope is not None:
        dzf = jnp.where(out >= 0, dzf, _F32(act_slope) * dzf)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ('NHWC', 'HWIO', 'NHWC'))
    wf = w.astype(_F32)
    dx = jax.lax.conv_general_dilated(
        dzf, jnp.flip(wf, (0, 1)).transpose(0, 1, 3, 2), (1, 1), 'SAME',
        dimension_numbers=dn).astype(x.dtype)
    xp = jnp.pad(x.astype(_F32), ((0, 0), (1, 1), (1, 1), (0, 0)))
    dw = jnp.stack([
        jnp.tensordot(xp[:, ky:ky + x.shape[1], kx:kx + x.shape[2]], dzf,
                      axes=((0, 1, 2), (0, 1, 2)))
        for ky in range(3) for kx in range(3)], 0).reshape(
            3, 3, x.shape[3], dz.shape[3]).astype(w.dtype)
    db = jnp.sum(dzf, axis=(0, 1, 2))
    return dx, dw, db, dzf


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _conv_vjp(act_slope, interpret, x, w, b):
    return _pallas_conv3x3(x, w, b, None, act_slope, interpret)


def _vjp_fwd(act_slope, interpret, x, w, b):
    out = _pallas_conv3x3(x, w, b, None, act_slope, interpret)
    return out, (x, w, out if act_slope is not None else None)


def _vjp_bwd(act_slope, interpret, res, dz):
    x, w, out = res
    dx, dw, db, _ = _grads(x, w, dz, out, act_slope)
    return dx, dw, db


_conv_vjp.defvjp(_vjp_fwd, _vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _conv_res_vjp(act_slope, interpret, x, w, b, residual):
    return _pallas_conv3x3(x, w, b, residual, act_slope, interpret)


def _res_vjp_fwd(act_slope, interpret, x, w, b, residual):
    out = _pallas_conv3x3(x, w, b, residual, act_slope, interpret)
    return out, (x, w, out if act_slope is not None else None)


def _res_vjp_bwd(act_slope, interpret, res, dz):
    x, w, out = res
    dx, dw, db, dzf = _grads(x, w, dz, out, act_slope)
    return dx, dw, db, dzf.astype(dz.dtype)


_conv_res_vjp.defvjp(_res_vjp_fwd, _res_vjp_bwd)


def conv_fusion_enabled() -> bool:
    """Whether archs may route their 3x3 convs through the fused kernel.

    Default OFF: on-chip A/B at SwinIR-M geometry (scripts/bench_conv3x3.py)
    measured 0.92-1.04x vs XLA's conv for BOTH formulations tried (nine
    shifted (HW,C)x(C,C') dots; row-offset taps on the HW-flattened image)
    — XLA's implicit-GEMM conv is already at the achievable level for
    these narrow channel counts, and the epilogue fusions it performs
    anyway. The kernel stays as tested infrastructure for future shapes;
    SWIN_FUSED_CONV=1 enables it for experiments."""
    import os
    return os.environ.get('SWIN_FUSED_CONV', '0') == '1'


def fused_conv3x3(x, w, b, residual=None, act_slope=None, interpret=False):
    """3x3 stride-1 same-pad conv with optional fused residual add and
    leaky-relu epilogues, NHWC/HWIO.

    Args:
      x: (B, H, W, Cin).
      w: (3, 3, Cin, Cout); b: (Cout,).
      residual: optional (B, H, W, Cout) added after bias.
      act_slope: optional negative-slope for a fused leaky-relu epilogue.
    Returns: (B, H, W, Cout), dtype of x.
    """
    from . import dispatch
    interpret = interpret or dispatch.interpret_forced()
    if not interpret and jax.default_backend() not in ('tpu',):
        return _xla_conv3x3(x, w, b, residual, act_slope)

    bsz, h, wd, cin = x.shape
    cout = w.shape[-1]
    # whole padded image + whole output block (+ optional residual block)
    # + weights must fit VMEM comfortably
    bpe = x.dtype.itemsize
    vmem = ((h + 3) * (wd + 2) * cin * bpe  # +3: pad + slice-bounds row
            + h * wd * cout * bpe * (2 if residual is not None else 1)
            + 9 * cin * cout * bpe)
    if vmem > 9e6 or h < 8 or wd % 8 != 0 or cin < 16:
        return _xla_conv3x3(x, w, b, residual, act_slope)

    mesh, data, spatial = dispatch.mesh_info()
    if mesh is not None:
        # conv halos need neighbor pixels: only the batch axis shards
        # cleanly here. Spatial meshes fall back to XLA (its SPMD
        # partitioner owns the halo exchange — docs/Config.md §spatial).
        if spatial > 1 or bsz % data != 0:
            return _xla_conv3x3(x, w, b, residual, act_slope)
        from jax.sharding import PartitionSpec as P
        if residual is None:
            fn = dispatch.shard_wrap(
                functools.partial(_conv_vjp, act_slope, interpret), mesh,
                in_specs=(P('data'), P(), P()), out_specs=P('data'))
            return fn(x, w, b)
        fn = dispatch.shard_wrap(
            functools.partial(_conv_res_vjp, act_slope, interpret), mesh,
            in_specs=(P('data'), P(), P(), P('data')), out_specs=P('data'))
        return fn(x, w, b, residual)

    if residual is None:
        return _conv_vjp(act_slope, interpret, x, w, b)
    return _conv_res_vjp(act_slope, interpret, x, w, b, residual)
