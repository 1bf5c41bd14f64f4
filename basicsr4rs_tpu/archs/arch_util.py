"""Shared architecture building blocks (Flax Linen, NHWC).

TPU-native re-design of reference basicsr/archs/arch_util.py:18-345. Layout is
NHWC throughout (channels on the 128-lane minor dim, convs map straight onto
the MXU); initializers reproduce the reference's scaled-MSRA scheme so that
trained-from-scratch statistics match; ``pixel_shuffle`` uses the same channel
ordering as torch's so converted reference checkpoints are bit-compatible.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def scaled_kaiming_init(scale: float = 1.0):
    """Kaiming-normal (fan_in, ReLU gain) scaled by ``scale`` — the
    reference's ``default_init_weights`` (arch_util.py:18-45)."""
    return nn.initializers.variance_scaling(2.0 * scale * scale, 'fan_in', 'normal')


def trunc_normal_init(std: float = 0.02):
    """Truncated normal on [-2std, 2std] (reference arch_util.py:304-345)."""
    # flax truncated_normal has stddev of the *untruncated* parent; the
    # reference (timm-style) also parameterizes by parent std.
    return nn.initializers.truncated_normal(stddev=std)


class Conv2d(nn.Module):
    """3x3-style conv with reference-matching init. NHWC."""
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = 'SAME'
    use_bias: bool = True
    init_scale: float = 1.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, self.kernel_size, strides=self.strides,
                       padding=self.padding, use_bias=self.use_bias,
                       kernel_init=scaled_kaiming_init(self.init_scale),
                       dtype=self.dtype, name='conv')(x)


class ResidualBlockNoBN(nn.Module):
    """conv-relu-conv with identity skip, no BN
    (reference arch_util.py:64-88). Residual branch init scaled 0.1."""
    num_feat: int = 64
    res_scale: float = 1.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        identity = x
        init = scaled_kaiming_init(0.1)
        out = nn.Conv(self.num_feat, (3, 3), kernel_init=init, dtype=self.dtype, name='conv1')(x)
        out = nn.relu(out)
        out = nn.Conv(self.num_feat, (3, 3), kernel_init=init, dtype=self.dtype, name='conv2')(out)
        return identity + out * self.res_scale


class ChannelAttention(nn.Module):
    """Squeeze-excite channel attention (reference rcan_arch.py:8-24 /
    arch_util CAM :91)."""
    num_feat: int
    squeeze_factor: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2), keepdims=True)  # global average pool
        y = nn.Conv(max(1, self.num_feat // self.squeeze_factor), (1, 1),
                    dtype=self.dtype, name='squeeze')(y)
        y = nn.relu(y)
        y = nn.Conv(self.num_feat, (1, 1), dtype=self.dtype, name='excite')(y)
        return x * jax.nn.sigmoid(y)


class CAM(nn.Module):
    """CBAM-style channel attention over max+avg pooled descriptors (RS
    addition, reference arch_util.py:91-109). The reference forward
    references a nonexistent ``self.linear`` — the evident intent (shared
    MLP on both pooled vectors) is implemented; torch checkpoints map via
    the real ``linear_max`` parameters."""
    channels: int
    r: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        mx = jnp.max(x, axis=(1, 2))
        avg = jnp.mean(x, axis=(1, 2))

        fc1 = nn.Dense(self.channels // self.r, dtype=self.dtype, name='linear_max_0')
        fc2 = nn.Dense(self.channels, dtype=self.dtype, name='linear_max_2')

        def mlp(v):
            return fc2(nn.relu(fc1(v)))

        gate = jax.nn.sigmoid(mlp(mx) + mlp(avg))[:, None, None, :]
        return gate * x


class CAB(nn.Module):
    """Channel-attention block: ResidualBlockNoBN + CAM (RS addition,
    reference arch_util.py:112-122)."""
    num_feat: int
    res_scale: float = 1.
    r: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = ResidualBlockNoBN(self.num_feat, self.res_scale, dtype=self.dtype,
                              name='conv_block')(x)
        return CAM(self.num_feat, self.r, dtype=self.dtype, name='cam')(y)


def pixel_shuffle(x: jnp.ndarray, upscale_factor: int) -> jnp.ndarray:
    """NHWC pixel shuffle with torch-compatible channel ordering:
    out[n, h*r+i, w*r+j, c] = x[n, h, w, c*r*r + i*r + j]."""
    n, h, w, c = x.shape
    r = upscale_factor
    oc = c // (r * r)
    x = x.reshape(n, h, w, oc, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, i, w, j, oc
    return x.reshape(n, h * r, w * r, oc)


def pixel_unshuffle(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Inverse of pixel_shuffle (reference arch_util.py:218-234):
    out[n, h, w, c*r*r + i*r + j] = x[n, h*r+i, w*r+j, c]."""
    n, hh, ww, c = x.shape
    r = scale
    h, w = hh // r, ww // r
    x = x.reshape(n, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # n, h, w, c, i, j
    return x.reshape(n, h, w, c * r * r)


class Conv3x3Params(nn.Module):
    """nn.Conv's 3x3 param layout (kernel/bias) as raw arrays for the fused
    conv kernel (ops/conv3x3.py) — checkpoint-compatible with ``nn.Conv``.
    The single definition of this layout: every fused-conv call site must
    use it so cross-path checkpoints stay interchangeable."""
    features_in: int
    features_out: int

    @nn.compact
    def __call__(self):
        return (self.param('kernel', nn.initializers.lecun_normal(),
                           (3, 3, self.features_in, self.features_out)),
                self.param('bias', nn.initializers.zeros,
                           (self.features_out,)))


def _up_conv(x, cin, cout, name, dtype):
    """Upsampler 3x3 conv routed through the fused Pallas conv when enabled
    (ops/conv3x3.py; falls back to XLA off-TPU / at unsupported geometry).
    Param tree identical to ``nn.Conv``."""
    from ..ops.conv3x3 import conv_fusion_enabled, fused_conv3x3

    if not conv_fusion_enabled():
        return nn.Conv(cout, (3, 3), dtype=dtype, name=name)(x)
    w, b = Conv3x3Params(cin, cout, name=name)()
    if dtype is not None:
        x = x.astype(dtype)
    return fused_conv3x3(x, w, b)


class Upsample(nn.Module):
    """Pixel-shuffle upsampler for scales 2^n and 3
    (reference arch_util.py:123-142)."""
    scale: int
    num_feat: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        scale = self.scale
        if (scale & (scale - 1)) == 0:  # power of 2
            n_stages = scale.bit_length() - 1
            for i in range(n_stages):
                x = _up_conv(x, self.num_feat, 4 * self.num_feat,
                             f'conv{i}', self.dtype)
                x = pixel_shuffle(x, 2)
        elif scale == 3:
            x = _up_conv(x, self.num_feat, 9 * self.num_feat, 'conv0',
                         self.dtype)
            x = pixel_shuffle(x, 3)
        else:
            raise ValueError(f'scale {scale} is not supported. Supported scales: 2^n and 3.')
        return x


class UpsampleOneStep(nn.Module):
    """Lightweight single-conv upsampler (reference swinir_arch.py:669)."""
    scale: int
    num_out_ch: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.num_out_ch * self.scale**2, (3, 3), dtype=self.dtype, name='conv')(x)
        return pixel_shuffle(x, self.scale)


def make_layer(block_fn: Callable[[int], nn.Module], num_blocks: int):
    """Construct ``num_blocks`` module instances (reference arch_util.py:48-61).
    Usage inside setup(): ``self.body = make_layer(lambda i: Block(...), n)``."""
    return [block_fn(i) for i in range(num_blocks)]


def flow_warp(x: jnp.ndarray,
              flow: jnp.ndarray,
              interpolation: str = 'bilinear',
              padding_mode: str = 'zeros',
              align_corners: bool = True) -> jnp.ndarray:
    """Warp an NHWC image/feature map by optical flow (reference
    arch_util.py:145-176, torch grid_sample there).

    Args:
        x: (N, H, W, C).
        flow: (N, H, W, 2), last dim = (dx, dy) in pixels — output pixel
            (h, w) samples input at (w + dx, h + dy), matching the reference
            grid construction.
    """
    n, h, w, c = x.shape
    grid_y = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    grid_x = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    sx = grid_x[None] + flow[..., 0]
    sy = grid_y[None] + flow[..., 1]

    if interpolation == 'nearest':
        ix = jnp.round(sx).astype(jnp.int32)
        iy = jnp.round(sy).astype(jnp.int32)
        valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        ix = jnp.clip(ix, 0, w - 1)
        iy = jnp.clip(iy, 0, h - 1)
        out = x[jnp.arange(n)[:, None, None], iy, ix]
        if padding_mode == 'zeros':
            out = out * valid[..., None].astype(x.dtype)
        return out

    # TPU fast path: the fused Pallas hat-function sampler (ops/dcn.py) —
    # no gather in the forward, no scatter-add in the backward. Bit-matches
    # the gather path below under exact f32 arithmetic (same hat/pad-ring
    # construction the DCN parity tests pin); ~30x faster fwd+bwd at video
    # train shapes. Returns None off-TPU / slab too big / unshardable mesh.
    if interpolation == 'bilinear' and padding_mode in ('zeros', 'border'):
        from ..ops.dcn import bilinear_warp
        fast = bilinear_warp(x, sy, sx, border=(padding_mode == 'border'))
        if fast is not None:
            return fast

    # Bilinear sampling as ONE 2x2-patch gather per map (TPU gather cost is
    # per-index, so fetching the whole patch is ~4x cheaper than 4 corner
    # gathers — same trick as ops/dcn.py). A 1px pad ring provides the
    # zero/replicate border semantics exactly.
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = (sx - x0).astype(x.dtype)[..., None]
    wy = (sy - y0).astype(x.dtype)[..., None]

    pad_mode = 'edge' if padding_mode == 'border' else 'constant'
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=pad_mode)
    sy0 = jnp.clip(y0 + 1, 0, h).astype(jnp.int32)
    sx0 = jnp.clip(x0 + 1, 0, w).astype(jnp.int32)
    batch = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None, None], (n, h, w))
    starts = jnp.stack([batch, sy0, sx0], axis=-1).reshape(n * h * w, 3)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(0,), start_index_map=(0, 1, 2))
    patch = jax.lax.gather(xp, starts, dnums, slice_sizes=(1, 2, 2, c),
                           mode=jax.lax.GatherScatterMode.CLIP)
    patch = patch.reshape(n, h, w, 2, 2, c)

    top = patch[..., 0, 0, :] * (1 - wx) + patch[..., 0, 1, :] * wx
    bot = patch[..., 1, 0, :] * (1 - wx) + patch[..., 1, 1, :] * wx
    out = top * (1 - wy) + bot * wy
    if padding_mode == 'zeros':
        inside = ((sy > -1) & (sy < h) & (sx > -1) & (sx < w))[..., None]
        out = out * inside.astype(x.dtype)
    return out


def resize_flow(flow: jnp.ndarray,
                size_type: str,
                sizes: Sequence[float],
                interpolation: str = 'bilinear') -> jnp.ndarray:
    """Resize an NHWC2 flow field and rescale its values
    (reference arch_util.py:179-215)."""
    n, h, w, _ = flow.shape
    if size_type == 'ratio':
        out_h, out_w = int(h * sizes[0]), int(w * sizes[1])
    elif size_type == 'shape':
        out_h, out_w = int(sizes[0]), int(sizes[1])
    else:
        raise ValueError(f'Size type should be ratio or shape, but got type {size_type}.')
    ratio_h, ratio_w = out_h / h, out_w / w
    method = jax.image.ResizeMethod.LINEAR if interpolation == 'bilinear' else jax.image.ResizeMethod.NEAREST
    resized = jax.image.resize(flow, (n, out_h, out_w, 2), method=method, antialias=False)
    return resized * jnp.asarray([ratio_w, ratio_h], dtype=flow.dtype)


def resize_nearest(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Integer-factor nearest upsample of NHWC, identical to torch
    ``F.interpolate(mode='nearest')``."""
    n, h, w, c = x.shape
    x = jnp.repeat(x, scale, axis=1)
    return jnp.repeat(x, scale, axis=2)


def _cubic_torch(t, a: float = -0.75):
    """Cubic convolution kernel with a=-0.75 (torch's bicubic). Pure numpy —
    must stay host-side so the weights are jit constants."""
    import numpy as np
    at = np.abs(t)
    at2, at3 = at * at, at ** 3
    f1 = (a + 2) * at3 - (a + 3) * at2 + 1
    f2 = a * at3 - 5 * a * at2 + 8 * a * at - 4 * a
    return np.where(at <= 1, f1, np.where(at < 2, f2, 0.0))


def _bicubic_weights(in_size: int, out_size: int, align_corners: bool):
    import numpy as np
    if align_corners and out_size > 1:
        pos = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        pos = (np.arange(out_size) + 0.5) * scale - 0.5
    base = np.floor(pos).astype(np.int64)
    frac = pos - base
    idx = base[:, None] + np.arange(-1, 3)[None, :]        # (out, 4)
    t = frac[:, None] - np.arange(-1, 3)[None, :]
    w = _cubic_torch(t)
    idx = np.clip(idx, 0, in_size - 1)
    return jnp.asarray(w, jnp.float32), jnp.asarray(idx)


def resize_bicubic(x: jnp.ndarray, scale: float, align_corners: bool = False) -> jnp.ndarray:
    """Bicubic resize of NHWC matching torch ``F.interpolate(mode='bicubic')``
    (a=-0.75, border clamp). Weights are static per shape — two einsums."""
    n, h, w, c = x.shape
    out_h, out_w = int(h * scale), int(w * scale)
    wh, ih = _bicubic_weights(h, out_h, align_corners)
    ww, iw = _bicubic_weights(w, out_w, align_corners)
    tmp = jnp.einsum('ok,nokwc->nowc', wh.astype(x.dtype), x[:, ih])
    out = jnp.einsum('ok,nhokc->nhoc', ww.astype(x.dtype), tmp[:, :, iw])
    return out


def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int, align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize of NHWC matching torch's ``interpolate(align_corners=False)``
    semantics (jax.image.resize LINEAR is half-pixel, same convention)."""
    n, h, w, c = x.shape
    if align_corners:
        # torch align_corners=True: sample positions i*(H-1)/(out-1).
        ys = jnp.linspace(0, h - 1, out_h)
        xs = jnp.linspace(0, w - 1, out_w)
        y0 = jnp.floor(ys).astype(jnp.int32)
        x0 = jnp.floor(xs).astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, h - 1)
        x1 = jnp.minimum(x0 + 1, w - 1)
        wy = (ys - y0).astype(x.dtype)
        wx = (xs - x0).astype(x.dtype)
        top = x[:, y0][:, :, x0] * (1 - wx)[None, None, :, None] + x[:, y0][:, :, x1] * wx[None, None, :, None]
        bot = x[:, y1][:, :, x0] * (1 - wx)[None, None, :, None] + x[:, y1][:, :, x1] * wx[None, None, :, None]
        return top * (1 - wy)[None, :, None, None] + bot * wy[None, :, None, None]
    # antialias=False matches torch F.interpolate(bilinear) on downscale
    return jax.image.resize(x, (n, out_h, out_w, c), method=jax.image.ResizeMethod.LINEAR,
                            antialias=False)
