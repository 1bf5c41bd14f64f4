"""Post-training int8 quantized inference (W8A8, dynamic activation scales).

TPU v5e executes int8 on the MXU at well above the bf16 rate — measured on
one chip via XLA alone: 4096³ matmul 260 TOP/s int8 vs 158 TFLOP/s bf16
(1.64×), 3×3/64-ch conv 65 vs 46 (1.40×). This module turns that into a
serving mode for ANY registered arch without touching the arch or its
checkpoint: Flax method interception rewrites every eligible ``nn.Conv``
call to an int8 MXU conv at trace time.

    from basicsr4rs_tpu.ops.quant import quantized_inference
    with quantized_inference():
        out = net.apply(params, lq)          # convs now run int8

or per-config: ``val: {quant_int8: true}`` routes model eval through it
(models/sr_model.py).

Scheme (standard PTQ):
  - weights: per-output-channel symmetric absmax int8, computed from the
    live bf16/f32 params at trace time (XLA constant-folds the rounding
    when params are compile-time constants; under jit it is a negligible
    per-call elementwise pass over the kernels);
  - activations: per-tensor symmetric int8 — **dynamic** absmax by
    default (calibration-free), or **static** scales collected by
    ``calibrate_act_scales``. Static is the fast path: a dynamic absmax
    is a full-tensor reduction between producer and consumer, which
    blocks XLA from fusing the quantize into the producer's epilogue;
    with static scales the conv chain keeps intermediates in int8 (half
    the HBM bytes of bf16) and each dequant+relu+requant fuses into one
    pass;
  - accumulation: int32 on the MXU, dequantized as
    ``acc * (s_x * s_w[c_out]) + bias`` in f32, cast back to the input
    dtype.

Quality guards — kept in the original precision:
  - image-boundary convs (in or out channels < ``min_channels``, e.g.
    ``conv_first`` from RGB and ``conv_last`` to RGB);
  - grouped/depthwise, dilated, non-2D, masked, and circular-padded convs.

The torch reference has no analog (its CUDA ops are f32/f16 only); this is
a TPU-native serving feature. Accuracy bounds are pinned by
tests/test_ops/test_quant.py (f32-vs-int8 output SNR on real archs).
"""

from __future__ import annotations

import contextlib
import functools
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

_QMAX = 127.0


def quantize_weight_int8(w: jnp.ndarray, reduce_axes) -> tuple:
    """Per-output-channel symmetric absmax quantization.

    Returns (w_int8, scale_f32) with ``scale`` shaped to broadcast over the
    output-channel (last) axis.
    """
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=reduce_axes,
                   keepdims=False)
    scale = jnp.maximum(amax, 1e-12) / _QMAX
    wq = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -_QMAX, _QMAX)
    return wq.astype(jnp.int8), scale


def quantize_act_int8(x: jnp.ndarray, scale=None) -> tuple:
    """Per-tensor symmetric int8 quantization of an activation: dynamic
    absmax when ``scale`` is None, otherwise the given static scale."""
    if scale is None:
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
        scale = jnp.maximum(amax, 1e-12) / _QMAX
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -_QMAX, _QMAX)
    return xq.astype(jnp.int8), scale


def int8_conv2d(x: jnp.ndarray, kernel: jnp.ndarray,
                bias: Optional[jnp.ndarray], strides, padding,
                act_scale=None) -> jnp.ndarray:
    """W8A8 2D conv: int8 inputs on the MXU, int32 accum, f32 dequant.

    x: (B, H, W, Cin); kernel: (kh, kw, Cin, Cout) HWIO. Returns x.dtype.
    """
    out_dtype = x.dtype
    xq, sx = quantize_act_int8(x, act_scale)
    wq, sw = quantize_weight_int8(kernel, reduce_axes=(0, 1, 2))
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ('NHWC', 'HWIO', 'NHWC'))
    acc = jax.lax.conv_general_dilated(xq, wq, strides, padding,
                                       dimension_numbers=dn,
                                       preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (sx * sw)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def _canonical_padding(padding, kernel_shape) -> Optional[Any]:
    """nn.Conv padding -> lax padding; None when unsupported here."""
    if isinstance(padding, str):
        return padding if padding in ('SAME', 'VALID', 'SAME_LOWER') else None
    if isinstance(padding, int):
        return [(padding, padding)] * 2
    try:
        pads = []
        for p in padding:
            if isinstance(p, int):
                pads.append((p, p))
            else:
                lo, hi = p
                pads.append((int(lo), int(hi)))
        return pads if len(pads) == 2 else None
    except TypeError:
        return None


def _canonical_tuple(v, n=2):
    if v is None:
        return (1,) * n
    if isinstance(v, int):
        return (v,) * n
    return tuple(v)


def _conv_eligible(mod: nn.Conv, kernel: jnp.ndarray,
                   min_channels: int) -> bool:
    if kernel.ndim != 4:                      # 2D convs only
        return False
    cin, cout = kernel.shape[2], kernel.shape[3]
    if min(cin, cout) < min_channels:         # image-boundary convs stay hp
        return False
    if getattr(mod, 'feature_group_count', 1) != 1:
        return False
    if getattr(mod, 'mask', None) is not None:
        return False
    if _canonical_tuple(getattr(mod, 'kernel_dilation', 1)) != (1, 1):
        return False
    if _canonical_tuple(getattr(mod, 'input_dilation', 1)) != (1, 1):
        return False
    return True


def _interceptor(next_fun, args, kwargs, context, *, min_channels: int,
                 act_scales=None, record=None):
    mod = context.module
    if (not isinstance(mod, nn.Conv) or context.method_name != '__call__'
            or mod.is_initializing()):
        return next_fun(*args, **kwargs)
    try:
        params = mod.variables['params']
        kernel = params['kernel']
    except Exception:
        return next_fun(*args, **kwargs)
    if not _conv_eligible(mod, kernel, min_channels):
        return next_fun(*args, **kwargs)
    x = args[0]
    if x.ndim != 4:
        return next_fun(*args, **kwargs)
    padding = _canonical_padding(mod.padding, kernel.shape)
    if padding is None:
        return next_fun(*args, **kwargs)
    path = tuple(getattr(mod, 'path', ()) or ())
    if record is not None:
        # calibration pass: record the pre-conv absmax, run the conv fp
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
        if isinstance(amax, jax.core.Tracer):
            # inside a traced scope (a lax/nn.scan body — recurrent video
            # trunks) the value cannot be read out even under an eager
            # apply; the site stays unrecorded and therefore runs fp at
            # static-scale inference. Use dynamic scales to quantize
            # scanned convs.
            return next_fun(*args, **kwargs)
        record[path] = max(record.get(path, 0.0), float(amax))
        return next_fun(*args, **kwargs)
    act_scale = None
    if act_scales is not None:
        amax = act_scales.get(path)
        if amax is None:                      # unseen site: stay fp
            return next_fun(*args, **kwargs)
        act_scale = max(amax, 1e-12) / _QMAX
    strides = _canonical_tuple(mod.strides)
    bias = params.get('bias') if mod.use_bias else None
    return int8_conv2d(x, kernel, bias, strides, padding, act_scale)


_SWIN_INT8 = False


def swin_kernels_int8() -> bool:
    """True while a ``quantized_inference(swin_kernels=True)`` scope is
    active: the SwinIR arch then routes its fused joint block through the
    W8A8 kernel (ops/swin_block.py ``_joint_int8_fwd_kernel``) — the fused
    Pallas path bypasses ``nn.Dense``, so Flax method interception cannot
    reach it and the arch checks this flag at trace time instead."""
    return _SWIN_INT8


@contextlib.contextmanager
def quantized_inference(min_channels: int = 16, act_scales=None,
                        swin_kernels: bool = False):
    """Context manager: every eligible ``nn.Conv`` applied inside runs as a
    W8A8 int8 MXU conv. Wrap the ``net.apply`` call (works inside jit — the
    rewrite happens at trace time).

    ``act_scales``: optional {module-path-tuple: absmax} from
    ``calibrate_act_scales`` — switches activation quantization from
    dynamic to static (the fast path; see module docstring). Conv sites
    missing from the dict stay in the original precision.

    ``swin_kernels``: also quantize the GEMMs inside the fused Swin joint
    block kernel (see :func:`swin_kernels_int8`). Default OFF: measured
    0.86x on SwinIR-M x4 at the headline serving shape — the block's GEMMs
    have K in {180, 192, 360}, too small for the int8 MXU rate to beat the
    in-kernel quantize/dequantize overhead (docs/Performance.md, "Int8 in
    the fused Swin kernel").
    """
    global _SWIN_INT8
    interceptor = functools.partial(_interceptor, min_channels=min_channels,
                                    act_scales=act_scales)
    prev = _SWIN_INT8
    _SWIN_INT8 = bool(swin_kernels)
    try:
        with nn.intercept_methods(interceptor):
            yield
    finally:
        _SWIN_INT8 = prev


def calibrate_act_scales(apply_fn, batches, min_channels: int = 16) -> dict:
    """Run ``apply_fn(batch)`` (full precision, eagerly — do NOT jit it)
    over the calibration ``batches`` and return {conv-path: max absmax
    seen} for every conv that ``quantized_inference`` would rewrite. Feed
    the result back as ``act_scales=``.

    Convs inside ``lax``/``nn.scan`` bodies (recurrent video trunks) are
    traced even under an eager apply and cannot be calibrated; they are
    skipped here and stay full-precision under static scales (use dynamic
    scales — ``act_scales=None`` — to quantize them)."""
    record: dict = {}
    interceptor = functools.partial(_interceptor, min_channels=min_channels,
                                    record=record)
    with nn.intercept_methods(interceptor):
        for batch in batches:
            jax.block_until_ready(apply_fn(batch))
    return record
