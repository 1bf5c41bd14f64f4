"""SwinIR — shifted-window transformer for SR / denoising / CAR
(reference: basicsr/archs/swinir_arch.py:85-956).

TPU-native notes:
  * NHWC end-to-end; window partition is reshape/transpose (layout-friendly).
  * Static shapes under jit: the shifted-window attention mask and relative-
    position index are computed with numpy at trace time (inputs are padded
    to window multiples by ``SwinIRModel``).
  * The attention inner loop (qk + bias + mask + softmax + v per window)
    runs through the Pallas fused kernel in ``ops/window_attention.py`` by
    default (``fused_attn=True``): it has a custom flash-style VJP so it is
    the hot path for BOTH training and inference on TPU, and falls back to
    the pure-XLA reference chain off-TPU or when ``attn_drop > 0``.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..utils.registry import ARCH_REGISTRY
from .arch_util import (Conv3x3Params, Upsample, pixel_shuffle,
                        resize_nearest, trunc_normal_init)


def window_partition(x: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, ws, ws, C) (reference swinir_arch.py:60-72)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window_size, window_size, w // window_size, window_size, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window_size, window_size, c)


def window_reverse(windows: jnp.ndarray, window_size: int, h: int, w: int) -> jnp.ndarray:
    """Inverse of window_partition (reference swinir_arch.py:75-92)."""
    b = windows.shape[0] // (h * w // window_size // window_size)
    x = windows.reshape(b, h // window_size, w // window_size, window_size, window_size, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


@lru_cache(maxsize=32)
def _relative_position_index(wh: int, ww: int) -> np.ndarray:
    """Pairwise relative-position index table (reference swinir_arch.py:119-133)."""
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing='ij'))  # 2, wh, ww
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]          # 2, N, N
    rel = rel.transpose(1, 2, 0)                        # N, N, 2
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)                                  # N, N


@lru_cache(maxsize=64)
def _shift_attn_mask(h: int, w: int, window_size: int, shift_size: int) -> np.ndarray:
    """(nW, N, N) 0/-100 mask for shifted windows (reference
    swinir_arch.py:226-244 calculate_mask)."""
    img_mask = np.zeros((1, h, w, 1), np.float32)
    h_slices = (slice(0, -window_size), slice(-window_size, -shift_size), slice(-shift_size, None))
    w_slices = (slice(0, -window_size), slice(-window_size, -shift_size), slice(-shift_size, None))
    cnt = 0
    for hs in h_slices:
        for ws in w_slices:
            img_mask[:, hs, ws, :] = cnt
            cnt += 1
    # window partition in numpy
    m = img_mask.reshape(1, h // window_size, window_size, w // window_size, window_size, 1)
    m = m.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window_size * window_size)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class Mlp(nn.Module):
    hidden_features: int
    out_features: int
    drop: float = 0.
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_features, kernel_init=trunc_normal_init(.02),
                     dtype=self.dtype, name='fc1')(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(self.out_features, kernel_init=trunc_normal_init(.02),
                     dtype=self.dtype, name='fc2')(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class DenseParams(nn.Module):
    """Parameter holder with nn.Dense's exact param layout (kernel/bias) —
    returns the raw arrays so fused kernels can consume them directly while
    checkpoints stay byte-compatible with the nn.Dense version."""
    features_in: int
    features_out: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param('kernel', trunc_normal_init(.02),
                            (self.features_in, self.features_out))
        bias = (self.param('bias', nn.initializers.zeros, (self.features_out,))
                if self.use_bias else None)
        return kernel, bias


def _conv3x3(x, params_mod, residual=None, act_slope=None, dtype=None):
    """Fused-or-XLA 3x3 conv helper: params from ``params_mod`` (same tree
    as nn.Conv), compute dtype follows the module convention."""
    from ..ops.conv3x3 import fused_conv3x3
    w, b = params_mod()
    if dtype is not None:
        x = x.astype(dtype)
    if residual is not None:
        residual = residual.astype(x.dtype)
    return fused_conv3x3(x, w, b, residual=residual, act_slope=act_slope)


class LNParams(nn.Module):
    """nn.LayerNorm's param layout (scale/bias), returned as raw arrays."""
    features: int

    @nn.compact
    def __call__(self):
        return (self.param('scale', nn.initializers.ones, (self.features,)),
                self.param('bias', nn.initializers.zeros, (self.features,)))


class MlpParams(nn.Module):
    """Mlp's param tree (fc1/fc2 kernel+bias) as raw arrays for the fused
    LN+MLP kernel — checkpoint-compatible with :class:`Mlp`."""
    in_features: int
    hidden_features: int

    @nn.compact
    def __call__(self):
        w1, b1 = DenseParams(self.in_features, self.hidden_features, name='fc1')()
        w2, b2 = DenseParams(self.hidden_features, self.in_features, name='fc2')()
        return w1, b1, w2, b2


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (reference swinir_arch.py:95-192).

    Three call paths over the SAME parameters: ``__call__`` (windowed
    tokens, torch-parity XLA chain), ``fused`` (full NHWC map through the
    Pallas fused window-attention kernel), and ``fused_block`` (the whole
    LN1+qkv+attention+proj branch in one Pallas call — the training and
    inference hot path on TPU; see ops/swin_block.py). All are
    differentiable (custom VJPs on the fused paths)."""
    dim: int
    window_size: Tuple[int, int]
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.
    proj_drop: float = 0.
    dtype: Any = None

    def setup(self):
        self.relative_position_bias_table = self.param(
            'relative_position_bias_table', trunc_normal_init(.02),
            ((2 * self.window_size[0] - 1) * (2 * self.window_size[1] - 1),
             self.num_heads))
        self.qkv = DenseParams(self.dim, self.dim * 3, use_bias=self.qkv_bias)
        self.proj = DenseParams(self.dim, self.dim)
        self.attn_dropout = nn.Dropout(self.attn_drop)
        self.proj_dropout = nn.Dropout(self.proj_drop)

    def _dense(self, x, w, b):
        """nn.Dense semantics: operands cast to module dtype."""
        dt = self.dtype or x.dtype
        y = x.astype(dt) @ w.astype(dt)
        if b is not None:
            y = y + b.astype(dt)
        return y

    def _bias_matrix(self, n):
        idx = _relative_position_index(*self.window_size)
        table = self.relative_position_bias_table
        return table[idx.reshape(-1)].reshape(n, n, -1).transpose(2, 0, 1)  # (nH, n, n)

    def __call__(self, x, mask=None, deterministic: bool = True):
        b_, n, c = x.shape
        head_dim = self.dim // self.num_heads
        scale = self.qk_scale or head_dim**-0.5

        qkv = self._dense(x, *self.qkv())
        qkv = qkv.reshape(b_, n, 3, self.num_heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]          # (b_, nH, n, hd)

        attn = (q * scale) @ k.transpose(0, 1, 3, 2)  # (b_, nH, n, n)
        attn = attn + self._bias_matrix(n)[None].astype(attn.dtype)

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, self.num_heads, n, n) + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(-1, self.num_heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = self.attn_dropout(attn, deterministic=deterministic)

        x = (attn @ v).transpose(0, 2, 1, 3).reshape(b_, n, c)
        x = self._dense(x, *self.proj())
        x = self.proj_dropout(x, deterministic=deterministic)
        return x

    def _packed_bias(self, window_size: int, mask):
        n = window_size * window_size
        bias = self._bias_matrix(n)[None].astype(jnp.float32)  # (1, nH, n, n)
        if mask is not None:
            bias = bias + jnp.asarray(mask)[:, None].astype(jnp.float32)
        return bias

    def fused(self, x, window_size: int, mask=None, deterministic: bool = True):
        """x: (B, H, W, C) (already shifted); one Pallas attention kernel."""
        from ..ops.window_attention import fused_window_attention
        head_dim = self.dim // self.num_heads
        scale = self.qk_scale or head_dim**-0.5
        qkv = self._dense(x, *self.qkv())
        bias = self._packed_bias(window_size, mask)
        out = fused_window_attention(qkv, bias, window_size, self.num_heads, scale)
        out = self._dense(out, *self.proj())
        return self.proj_dropout(out, deterministic=deterministic)

    def fused_block(self, x, ln_scale, ln_bias, window_size: int, mask=None,
                    deterministic: bool = True, add_residual: bool = False,
                    residual_scale=None):
        """The whole attention branch — LN1(x) -> qkv -> W-MSA -> proj — in
        one Pallas call (ops/swin_block.py). x: (B, H, W, C), already
        shifted; the caller adds the residual (and DropPath) unless
        ``add_residual`` folds it into the kernel (requires proj_drop=0).
        ``residual_scale`` (B,) folds DropPath's per-sample mask/keep:
        kernel computes x + s*branch."""
        from ..ops.swin_block import fused_swin_attn_block
        head_dim = self.dim // self.num_heads
        scale = self.qk_scale or head_dim**-0.5
        wqkv, bqkv = self.qkv()
        wproj, bproj = self.proj()
        if bqkv is None:
            bqkv = jnp.zeros((self.dim * 3,), jnp.float32)
        bias = self._packed_bias(window_size, mask)
        out = fused_swin_attn_block(x, ln_scale, ln_bias, wqkv, bqkv, wproj,
                                    bproj, bias, window_size, self.num_heads,
                                    scale, add_residual=add_residual,
                                    residual_scale=residual_scale)
        return self.proj_dropout(out, deterministic=deterministic)

    def fused_joint(self, x, ln1_scale, ln1_bias, ln2_scale, ln2_bias,
                    w1, b1, w2, b2, window_size: int, mask=None,
                    residual_scales=None):
        """The WHOLE Swin block — LN1+qkv+W-MSA+proj + residual, then
        LN2+fc1+GELU+fc2 + residual — in ONE Pallas call
        (ops/swin_block.py fused_swin_block_full). Every dropout must be
        identity; DropPath either identity or folded in via
        ``residual_scales`` = (s1, s2) per-sample mask/keep scales;
        x: (B, H, W, C), already shifted (the per-token MLP commutes with
        the caller's roll-back)."""
        from ..ops.quant import swin_kernels_int8
        from ..ops.swin_block import fused_swin_block_full
        head_dim = self.dim // self.num_heads
        scale = self.qk_scale or head_dim**-0.5
        wqkv, bqkv = self.qkv()
        wproj, bproj = self.proj()
        if bqkv is None:
            bqkv = jnp.zeros((self.dim * 3,), jnp.float32)
        bias = self._packed_bias(window_size, mask)
        return fused_swin_block_full(x, ln1_scale, ln1_bias, wqkv, bqkv,
                                     wproj, bproj, bias, ln2_scale, ln2_bias,
                                     w1, b1, w2, b2, window_size,
                                     self.num_heads, scale,
                                     quant_int8=swin_kernels_int8(),
                                     residual_scales=residual_scales)


class DropPath(nn.Module):
    """Per-sample stochastic depth."""
    rate: float = 0.

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0. or deterministic:
            return x
        keep = 1. - self.rate
        rng = self.make_rng('dropout')
        mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
        return x * mask.astype(x.dtype) / keep


class SwinTransformerBlock(nn.Module):
    """(reference swinir_arch.py:194-310)"""
    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.
    attn_drop: float = 0.
    drop_path: float = 0.
    fused_attn: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, x_size, deterministic: bool = True):
        h, w = x_size
        b, _, c = x.shape
        # small inputs: shrink window, no shift (reference :218-222)
        window_size, shift_size = self.window_size, self.shift_size
        if min(x_size) <= window_size:
            shift_size = 0
            window_size = min(x_size)

        shortcut = x
        attn_mod = WindowAttention(self.dim, (window_size, window_size), self.num_heads,
                                   self.qkv_bias, self.qk_scale, self.attn_drop, self.drop,
                                   dtype=self.dtype, name='attn')
        fused = self.fused_attn and self.attn_drop == 0.

        if fused:
            # LN1 is folded into the fused block kernel; LN is pointwise so
            # applying it after the shift-roll is numerically identical.
            ln_scale, ln_bias = LNParams(self.dim, name='norm1')()
            x = x.reshape(b, h, w, c)
        else:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm1')(x)
            x = x.reshape(b, h, w, c)

        if shift_size > 0:
            x = jnp.roll(x, (-shift_size, -shift_size), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(h, w, window_size, shift_size))
        else:
            mask = None

        # DropPath is identity when rate==0 or at eval, so the residual adds
        # can fold into the fused kernels (the kernel input is the rolled
        # shortcut; roll-back commutes with the addition)
        fold_residual = (fused and self.drop == 0.
                         and (self.drop_path == 0. or deterministic))
        # Training with stochastic depth: fold DropPath's per-sample
        # mask/keep scale into the kernels (x + s*branch) — same semantics
        # as the reference's DropPath(attn)+residual (swinir_arch.py:262),
        # without the XLA mask-multiply/residual round trips per branch.
        fold_scaled = (fused and self.drop == 0. and not deterministic
                       and self.drop_path > 0.)
        if fold_scaled:
            keep = 1. - self.drop_path
            rng1, rng2 = jax.random.split(self.make_rng('dropout'))
            s1 = jax.random.bernoulli(rng1, keep, (b,)).astype(jnp.float32) / keep
            s2 = jax.random.bernoulli(rng2, keep, (b,)).astype(jnp.float32) / keep

        # The whole block (attn + MLP, both residuals) in ONE Pallas call —
        # removes the kernel-boundary HBM round trip of the post-attention
        # activation. Inference routes here when both DropPaths are
        # identity. Training CAN route here (per-sample stochastic-depth
        # scales folded into the kernel, flash-style scaled VJP —
        # ops/swin_block.py _fused_joint_scaled_vjp) but defaults to the
        # two-kernel split: the joint VJP's attention recompute measured
        # 12% slower than the split's HBM round trip at SwinIR-M train
        # shapes (A/B in docs/Performance.md; SWIN_JOINT_TRAIN=1 to flip).
        from ..ops.swin_block import joint_block_enabled, joint_train_enabled
        if ((fold_residual or fold_scaled) and joint_block_enabled()
                and (deterministic or joint_train_enabled())):
            ln2_scale, ln2_bias = LNParams(self.dim, name='norm2')()
            w1, b1, w2, b2 = MlpParams(self.dim, int(self.dim * self.mlp_ratio),
                                       name='mlp')()
            x = attn_mod.fused_joint(x, ln_scale, ln_bias, ln2_scale, ln2_bias,
                                     w1, b1, w2, b2, window_size, mask=mask,
                                     residual_scales=((s1, s2) if fold_scaled
                                                      else None))
            if shift_size > 0:
                x = jnp.roll(x, (shift_size, shift_size), axis=(1, 2))
            return x.reshape(b, h * w, c)

        if fused:
            # whole branch (LN1+qkv+attn+proj) in one Pallas call
            x = attn_mod.fused_block(x, ln_scale, ln_bias, window_size,
                                     mask=mask, deterministic=deterministic,
                                     add_residual=fold_residual,
                                     residual_scale=s1 if fold_scaled else None)
        else:
            x_windows = window_partition(x, window_size).reshape(-1, window_size * window_size, c)
            attn_windows = attn_mod(x_windows, mask=mask, deterministic=deterministic)
            x = window_reverse(attn_windows.reshape(-1, window_size, window_size, c),
                               window_size, h, w)

        if shift_size > 0:
            x = jnp.roll(x, (shift_size, shift_size), axis=(1, 2))
        x = x.reshape(b, h * w, c)

        if not fold_residual and not fold_scaled:
            x = shortcut + DropPath(self.drop_path)(x, deterministic)
        if fused and self.drop == 0.:
            # LN2+fc1+GELU+fc2 in one Pallas call (ops/mlp_block.py); params
            # stay at norm2.* / mlp.fc1.* / mlp.fc2.* so checkpoints are
            # identical to the unfused path.
            from ..ops.mlp_block import fused_mlp_block
            ln2_scale, ln2_bias = LNParams(self.dim, name='norm2')()
            w1, b1, w2, b2 = MlpParams(self.dim, int(self.dim * self.mlp_ratio),
                                       name='mlp')()
            mlp_out = fused_mlp_block(x, ln2_scale, ln2_bias, w1, b1, w2, b2,
                                      add_residual=fold_residual,
                                      residual_scale=(s2[:, None] if fold_scaled
                                                      else None))
            if fold_residual or fold_scaled:
                return mlp_out
        else:
            mlp_out = Mlp(int(self.dim * self.mlp_ratio), self.dim, self.drop,
                          dtype=self.dtype, name='mlp')(
                nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm2')(x), deterministic)
            if fold_residual:
                return x + mlp_out
        return x + DropPath(self.drop_path)(mlp_out, deterministic)


class BasicLayer(nn.Module):
    """Stack of Swin blocks (reference swinir_arch.py:393-477)."""
    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.
    attn_drop: float = 0.
    drop_path: Sequence[float] = ()
    fused_attn: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, x_size, deterministic: bool = True):
        for i in range(self.depth):
            dp = self.drop_path[i] if i < len(self.drop_path) else 0.
            x = SwinTransformerBlock(
                self.dim, self.num_heads, self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                drop=self.drop, attn_drop=self.attn_drop, drop_path=dp,
                fused_attn=self.fused_attn,
                dtype=self.dtype, name=f'blocks_{i}')(x, x_size, deterministic)
        return x


class RSTB(nn.Module):
    """Residual Swin Transformer Block (reference swinir_arch.py:480-569)."""
    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.
    attn_drop: float = 0.
    drop_path: Sequence[float] = ()
    resi_connection: str = '1conv'
    fused_attn: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, x_size, deterministic: bool = True):
        h, w = x_size
        res = BasicLayer(self.dim, self.depth, self.num_heads, self.window_size,
                         self.mlp_ratio, self.qkv_bias, self.qk_scale, self.drop,
                         self.attn_drop, self.drop_path, fused_attn=self.fused_attn,
                         dtype=self.dtype,
                         name='residual_group')(x, x_size, deterministic)
        b, n, c = res.shape
        img = res.reshape(b, h, w, c)
        if self.resi_connection == '1conv':
            from ..ops.conv3x3 import conv_fusion_enabled
            if conv_fusion_enabled():
                # tail conv + the RSTB residual in one fused kernel
                out = _conv3x3(img, Conv3x3Params(self.dim, self.dim,
                                                  name='conv'),
                               residual=x.reshape(b, h, w, c),
                               dtype=self.dtype)
                return out.reshape(b, n, c)
            img = nn.Conv(self.dim, (3, 3), dtype=self.dtype, name='conv')(img)
        elif self.resi_connection == '3conv':
            img = nn.Conv(self.dim // 4, (3, 3), dtype=self.dtype, name='conv_0')(img)
            img = nn.leaky_relu(img, negative_slope=0.2)
            img = nn.Conv(self.dim // 4, (1, 1), dtype=self.dtype, name='conv_2')(img)
            img = nn.leaky_relu(img, negative_slope=0.2)
            img = nn.Conv(self.dim, (3, 3), dtype=self.dtype, name='conv_4')(img)
        return img.reshape(b, n, c) + x


@ARCH_REGISTRY.register()
class SwinIR(nn.Module):
    """(reference swinir_arch.py:694-956)"""
    @property
    def torch_key_rules(self):
        rules = [
            (r'patch_embed\.norm\.', 'patch_embed_norm.'),
            (r'(norm\d*)\.weight$', r'\1.scale'),
        ]
        if self.upsampler == 'pixelshuffle':
            # classical-SR Upsample Sequential indices 0/2 -> conv0/conv1
            rules.append((r'^upsample\.(\d+)\.', lambda m: f'upsample.conv{int(m.group(1)) // 2}.'))
        return tuple(rules)

    img_size: int = 64
    patch_size: int = 1
    in_chans: int = 3
    embed_dim: int = 96
    depths: Sequence[int] = (6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6)
    window_size: int = 7
    mlp_ratio: float = 4.
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.
    attn_drop_rate: float = 0.
    drop_path_rate: float = 0.1
    ape: bool = False
    patch_norm: bool = True
    upscale: int = 2
    img_range: float = 1.
    upsampler: str = ''
    resi_connection: str = '1conv'
    fused_attn: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        num_feat = 64
        if self.in_chans == 3:
            mean = jnp.asarray((0.4488, 0.4371, 0.4040), dtype=x.dtype)
        else:
            mean = jnp.zeros((1,), dtype=x.dtype)
        x = (x - mean) * self.img_range

        b, h, w, _ = x.shape
        x_size = (h, w)

        def forward_features(feat):
            bb, hh, ww, cc = feat.shape
            seq = feat.reshape(bb, hh * ww, cc)
            if self.patch_norm:
                seq = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                   name='patch_embed_norm')(seq)
            if self.ape:
                ape = self.param('absolute_pos_embed', trunc_normal_init(.02),
                                 (1, hh * ww, self.embed_dim))
                seq = seq + ape
            seq = nn.Dropout(self.drop_rate)(seq, deterministic=deterministic)

            dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()
            for i, depth in enumerate(self.depths):
                start = sum(self.depths[:i])
                seq = RSTB(self.embed_dim, depth, self.num_heads[i], self.window_size,
                           self.mlp_ratio, self.qkv_bias, self.qk_scale, self.drop_rate,
                           self.attn_drop_rate, tuple(dpr[start:start + depth]),
                           self.resi_connection, fused_attn=self.fused_attn,
                           dtype=self.dtype,
                           name=f'layers_{i}')(seq, (hh, ww), deterministic)
            seq = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm')(seq)
            return seq.reshape(bb, hh, ww, cc)

        lrelu = lambda v, s=0.01: nn.leaky_relu(v, negative_slope=s)  # noqa: E731

        from ..ops.conv3x3 import conv_fusion_enabled
        use_fc = conv_fusion_enabled()

        def fconv(v, cin, cout, name, residual=None, slope=None):
            """3x3 conv with the residual / leaky-relu epilogue fused into
            the Pallas conv kernel when enabled (identical param tree)."""
            if use_fc:
                return _conv3x3(v, Conv3x3Params(cin, cout, name=name),
                                residual=residual, act_slope=slope,
                                dtype=self.dtype)
            out = nn.Conv(cout, (3, 3), dtype=self.dtype, name=name)(v)
            if residual is not None:
                out = out + residual
            if slope is not None:
                out = nn.leaky_relu(out, negative_slope=slope)
            return out

        dim = self.embed_dim

        if self.upsampler == 'pixelshuffle':
            feat = nn.Conv(self.embed_dim, (3, 3), dtype=self.dtype, name='conv_first')(x)
            feat = fconv(forward_features(feat), dim, dim, 'conv_after_body',
                         residual=feat)
            feat = fconv(feat, dim, num_feat, 'conv_before_upsample_0',
                         slope=0.01)
            out = nn.Conv(self.in_chans, (3, 3), dtype=self.dtype, name='conv_last')(
                Upsample(self.upscale, num_feat, dtype=self.dtype, name='upsample')(feat))
        elif self.upsampler == 'pixelshuffledirect':
            feat = nn.Conv(self.embed_dim, (3, 3), dtype=self.dtype, name='conv_first')(x)
            feat = fconv(forward_features(feat), dim, dim, 'conv_after_body',
                         residual=feat)
            out = pixel_shuffle(nn.Conv(self.in_chans * self.upscale**2, (3, 3),
                                        dtype=self.dtype, name='upsample_0')(feat), self.upscale)
        elif self.upsampler == 'nearest+conv':
            assert self.upscale == 4, 'only support x4 now.'
            feat = nn.Conv(self.embed_dim, (3, 3), dtype=self.dtype, name='conv_first')(x)
            feat = fconv(forward_features(feat), dim, dim, 'conv_after_body',
                         residual=feat)
            feat = fconv(feat, dim, num_feat, 'conv_before_upsample_0',
                         slope=0.01)
            feat = fconv(resize_nearest(feat, 2), num_feat, num_feat,
                         'conv_up1', slope=0.2)
            feat = fconv(resize_nearest(feat, 2), num_feat, num_feat,
                         'conv_up2', slope=0.2)
            out = nn.Conv(self.in_chans, (3, 3), dtype=self.dtype, name='conv_last')(
                fconv(feat, num_feat, num_feat, 'conv_hr', slope=0.2))
        else:
            # denoising / CAR: residual around the deep features
            feat_first = nn.Conv(self.embed_dim, (3, 3), dtype=self.dtype, name='conv_first')(x)
            res = fconv(forward_features(feat_first), dim, dim,
                        'conv_after_body', residual=feat_first)
            out = x + nn.Conv(self.in_chans, (3, 3), dtype=self.dtype, name='conv_last')(res)

        return out / self.img_range + mean
