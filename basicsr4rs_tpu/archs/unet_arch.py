"""ResShift denoiser UNets (reference: basicsr/archs/unet_arch.py:30-1196).

ADM-style UNet with timestep embedding whose attention stages are Swin
transformer layers (GroupNorm32 flavor, reference archs/resshift/
swin_transformer.py); ``cond_lq`` concatenates the (optionally feature-
extracted and resized) LQ to the input. NHWC.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..utils.registry import ARCH_REGISTRY
from .arch_util import pixel_unshuffle, resize_bicubic, resize_nearest
from .swinir_arch import WindowAttention, window_partition, window_reverse, _shift_attn_mask


def timestep_embedding(timesteps, dim: int, max_period: int = 10000):
    """Sinusoidal embeddings (reference resshift/basic_ops.py:99-117)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps[:, None].astype(jnp.float32) * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def _group_norm(name, ch):
    return nn.GroupNorm(num_groups=min(32, ch), epsilon=1e-5, name=name)


@__import__('functools').lru_cache(maxsize=64)
def _shift_attn_mask_resshift(h: int, w: int, window_size: int, shift_size: int) -> np.ndarray:
    """Shift mask with the reference resshift quirk
    (reference archs/resshift/swin_transformer.py:213-236): ``img_mask`` is
    allocated (1, 1, H, W) but sliced as if NHWC, so the h_slices collapse
    onto the size-1 channel dim (no-ops) and only the final region-id row
    (6/7/8) lands — the effective mask varies along H only. Trained
    checkpoints depend on this exact behavior."""
    rows = np.zeros((h,), np.float32)
    rows[0:h - window_size] = 6
    rows[h - window_size:h - shift_size] = 7
    rows[h - shift_size:] = 8
    img = np.broadcast_to(rows[:, None], (h, w)).copy()
    m = img.reshape(1, h // window_size, window_size, w // window_size, window_size)
    # second reference quirk: calculate_mask permutes the already-HWC window
    # once more, flattening tokens in TRANSPOSED (w-major) order relative to
    # the data windows
    m = m.transpose(0, 1, 3, 4, 2).reshape(-1, window_size * window_size)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class ADMUpsample(nn.Module):
    """Nearest x2 (+ optional conv) (reference unet_arch.py:55-83)."""
    channels: int
    use_conv: bool
    out_channels: Optional[int] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = resize_nearest(x, 2)
        if self.use_conv:
            x = nn.Conv(self.out_channels or self.channels, (3, 3), dtype=self.dtype,
                        name='conv')(x)
        return x


class ADMDownsample(nn.Module):
    """Stride-2 conv or avg-pool (reference unet_arch.py:85-110)."""
    channels: int
    use_conv: bool
    out_channels: Optional[int] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        if self.use_conv:
            return nn.Conv(self.out_channels or self.channels, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)), dtype=self.dtype, name='op')(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class ResBlock(nn.Module):
    """ADM residual block with (optional) scale-shift norm
    (reference unet_arch.py:112-225)."""
    channels: int
    emb_channels: int
    dropout: float = 0.
    out_channels: Optional[int] = None
    use_conv: bool = False
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True):
        out_ch = self.out_channels or self.channels

        h = _group_norm('in_layers_0', self.channels)(x)
        h = nn.silu(h)
        if self.up:
            h = resize_nearest(h, 2)
            x = resize_nearest(x, 2)
        elif self.down:
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        h = nn.Conv(out_ch, (3, 3), dtype=self.dtype, name='in_layers_2')(h)

        emb_out = nn.Dense(2 * out_ch if self.use_scale_shift_norm else out_ch,
                           dtype=self.dtype, name='emb_layers_1')(nn.silu(emb))
        emb_out = emb_out[:, None, None, :]

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = _group_norm('out_layers_0', out_ch)(h) * (1 + scale) + shift
        else:
            h = h + emb_out
            h = _group_norm('out_layers_0', out_ch)(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(out_ch, (3, 3), kernel_init=nn.initializers.zeros,
                    dtype=self.dtype, name='out_layers_3')(h)

        if out_ch == self.channels:
            skip = x
        elif self.use_conv:
            skip = nn.Conv(out_ch, (3, 3), dtype=self.dtype, name='skip_connection')(x)
        else:
            skip = nn.Conv(out_ch, (1, 1), dtype=self.dtype, name='skip_connection')(x)
        return skip + h


class AttentionBlock(nn.Module):
    """Global QKV self-attention block (reference unet_arch.py:227-268)."""
    channels: int
    num_heads: int = 1
    num_head_channels: int = -1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        heads = (self.num_heads if self.num_head_channels == -1
                 else c // self.num_head_channels)
        hnorm = _group_norm('norm', c)(x).reshape(n, h * w, c)
        qkv = nn.Conv(3 * c, (1,), dtype=self.dtype, name='qkv')(hnorm)
        q, k, v = jnp.split(qkv.reshape(n, h * w, 3, heads, c // heads), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]  # (n, hw, heads, hd)
        scale = 1 / math.sqrt(math.sqrt(c // heads))
        attn = jnp.einsum('nqhc,nkhc->nhqk', q * scale, k * scale)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum('nhqk,nkhc->nqhc', attn, v).reshape(n, h * w, c)
        out = nn.Conv(c, (1,), kernel_init=nn.initializers.zeros, dtype=self.dtype,
                      name='proj_out')(out)
        return x + out.reshape(n, h, w, c)


class SwinBlockGN(nn.Module):
    """Swin block with GroupNorm (resshift flavor,
    reference archs/resshift/swin_transformer.py:199-345). NHWC."""
    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float = 2.
    fused_attn: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        n, h, w, c = x.shape
        window_size, shift_size = self.window_size, self.shift_size
        if min(h, w) <= window_size:
            shift_size = 0
            window_size = min(h, w)

        shortcut = x
        xn = _group_norm('norm1', c)(x)
        if shift_size > 0:
            xn = jnp.roll(xn, (-shift_size, -shift_size), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask_resshift(h, w, window_size, shift_size))
        else:
            mask = None
        attn_mod = WindowAttention(self.dim, (window_size, window_size), self.num_heads,
                                   dtype=self.dtype, name='attn')
        if self.fused_attn:
            xn = attn_mod.fused(xn, window_size, mask=mask, deterministic=deterministic)
        else:
            xw = window_partition(xn, window_size).reshape(-1, window_size * window_size, c)
            attn = attn_mod(xw, mask=mask, deterministic=deterministic)
            xn = window_reverse(attn.reshape(-1, window_size, window_size, c), window_size, h, w)
        if shift_size > 0:
            xn = jnp.roll(xn, (shift_size, shift_size), axis=(1, 2))
        x = shortcut + xn

        y = _group_norm('norm2', c)(x)
        # 1x1 convs (not Dense) to match the reference's Conv2d MLP layout
        y = nn.Conv(int(c * self.mlp_ratio), (1, 1), dtype=self.dtype, name='mlp_fc1')(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name='mlp_fc2')(y)
        return x + y


class BasicLayer(nn.Module):
    """Patch embed (1x1) -> swin blocks -> patch unembed
    (reference archs/resshift/swin_transformer.py:347-449)."""
    in_chans: int
    embed_dim: int
    num_heads: int
    window_size: int
    depth: int = 2
    mlp_ratio: float = 2.
    patch_norm: bool = False
    fused_attn: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype, name='patch_embed_proj')(x)
        if self.patch_norm:
            h = _group_norm('patch_embed_norm', self.embed_dim)(h)
        for i in range(self.depth):
            h = SwinBlockGN(self.embed_dim, self.num_heads, self.window_size,
                            shift_size=0 if i % 2 == 0 else self.window_size // 2,
                            mlp_ratio=self.mlp_ratio, fused_attn=self.fused_attn,
                            dtype=self.dtype,
                            name=f'blocks_{i}')(h, deterministic)
        h = nn.Conv(self.in_chans, (1, 1), dtype=self.dtype, name='patch_unembed_proj')(h)
        if self.patch_norm:
            h = _group_norm('patch_unembed_norm', self.in_chans)(h)
        return h


@ARCH_REGISTRY.register()
class UNetModelSwin(nn.Module):
    """(reference unet_arch.py:611-927)"""
    TORCH_KEY_RULES = (
        # GroupNorms store weight/bias; flax GroupNorm names them scale/bias
        (r'(in_layers\.0|out_layers\.0|norm[12]?|patch_embed\.norm|patch_unembed\.norm|out\.0)\.weight$',
         r'\1.scale'),
        (r'patch_embed\.proj\.', 'patch_embed_proj.'),
        (r'patch_unembed\.proj\.', 'patch_unembed_proj.'),
        (r'mlp\.fc1\.', 'mlp_fc1.'),
        (r'mlp\.fc2\.', 'mlp_fc2.'),
    )

    image_size: int
    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: Any = 2
    attention_resolutions: Sequence[int] = (64, 32)
    dropout: float = 0.
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_resample: bool = True
    num_heads: int = 1
    num_head_channels: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    swin_depth: int = 2
    swin_embed_dim: int = 96
    window_size: int = 8
    mlp_ratio: float = 2.0
    patch_norm: bool = False
    cond_lq: bool = True
    cond_mask: bool = False
    lq_size: int = 256
    lq_channels: Optional[int] = None  # used by model init plumbing only
    fused_attn: bool = True
    dtype: Any = None

    def _swin_heads(self):
        return (self.num_heads if self.num_head_channels == -1
                else self.swin_embed_dim // self.num_head_channels)

    @nn.compact
    def __call__(self, x, timesteps, lq=None, mask=None, deterministic: bool = True):
        num_res_blocks = (self.num_res_blocks if isinstance(self.num_res_blocks, (list, tuple))
                          else [self.num_res_blocks] * len(self.channel_mult))
        time_embed_dim = self.model_channels * 4
        emb = timestep_embedding(timesteps, self.model_channels)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name='time_embed_0')(emb)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name='time_embed_2')(nn.silu(emb))

        # LQ conditioning (reference :874-907)
        if lq is not None:
            assert self.cond_lq
            if mask is not None:
                assert self.cond_mask
                lq = jnp.concatenate([lq, mask], axis=-1)
            if not (self.cond_lq and self.lq_size == self.image_size):
                base_chn = 16
                feat = lq
                n_down = int(math.log(self.lq_size / self.image_size) / math.log(2))
                for ii in range(n_down):
                    feat = nn.silu(nn.Conv(base_chn, (3, 3), dtype=self.dtype,
                                           name=f'feature_extractor_{3 * ii}')(feat))
                    feat = ADMDownsample(base_chn, True, out_channels=base_chn * 2,
                                         dtype=self.dtype,
                                         name=f'feature_extractor_{3 * ii + 2}')(feat)
                    base_chn *= 2
                lq = feat
            lq = resize_bicubic(lq, x.shape[1] / lq.shape[1])
            x = jnp.concatenate([x, lq], axis=-1)

        def res(name, ch_in, ch_out, **kw):
            return ResBlock(ch_in, time_embed_dim, self.dropout, out_channels=ch_out,
                            use_scale_shift_norm=self.use_scale_shift_norm,
                            dtype=self.dtype, name=name, **kw)

        def swin(name, ch):
            return BasicLayer(ch, self.swin_embed_dim, self._swin_heads(),
                              self.window_size, self.swin_depth, self.mlp_ratio,
                              self.patch_norm, fused_attn=self.fused_attn,
                              dtype=self.dtype, name=name)

        ch = input_ch = int(self.channel_mult[0] * self.model_channels)
        h = nn.Conv(ch, (3, 3), dtype=self.dtype, name='input_blocks_0_0')(x)
        hs = [h]
        input_block_chans = [ch]
        ds = self.image_size
        blk = 1
        for level, mult in enumerate(self.channel_mult):
            for jj in range(num_res_blocks[level]):
                h = res(f'input_blocks_{blk}_0', ch, int(mult * self.model_channels))(
                    h, emb, deterministic)
                ch = int(mult * self.model_channels)
                if ds in self.attention_resolutions and jj == 0:
                    h = swin(f'input_blocks_{blk}_1', ch)(h, deterministic)
                hs.append(h)
                input_block_chans.append(ch)
                blk += 1
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = res(f'input_blocks_{blk}_0', ch, ch, down=True)(h, emb, deterministic)
                else:
                    h = ADMDownsample(ch, self.conv_resample, out_channels=ch,
                                      dtype=self.dtype, name=f'input_blocks_{blk}_0')(h)
                hs.append(h)
                input_block_chans.append(ch)
                ds //= 2
                blk += 1

        h = res('middle_block_0', ch, ch)(h, emb, deterministic)
        h = swin('middle_block_1', ch)(h, deterministic)
        h = res('middle_block_2', ch, ch)(h, emb, deterministic)

        blk = 0
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(num_res_blocks[level] + 1):
                ich = input_block_chans.pop()
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = res(f'output_blocks_{blk}_0', ch + ich,
                        int(self.model_channels * mult))(h, emb, deterministic)
                ch = int(self.model_channels * mult)
                sub = 1
                if ds in self.attention_resolutions and i == 0:
                    h = swin(f'output_blocks_{blk}_{sub}', ch)(h, deterministic)
                    sub += 1
                if level and i == num_res_blocks[level]:
                    if self.resblock_updown:
                        h = res(f'output_blocks_{blk}_{sub}', ch, ch, up=True)(h, emb, deterministic)
                    else:
                        h = ADMUpsample(ch, self.conv_resample, out_channels=ch,
                                        dtype=self.dtype,
                                        name=f'output_blocks_{blk}_{sub}')(h)
                    ds *= 2
                blk += 1

        h = _group_norm('out_0', ch)(h)
        h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3), kernel_init=nn.initializers.zeros,
                       dtype=self.dtype, name='out_2')(h)


@ARCH_REGISTRY.register()
class UNetModel(nn.Module):
    """Vanilla-attention ADM UNet (reference unet_arch.py:352-610)."""
    TORCH_KEY_RULES = (
        (r'(in_layers\.0|out_layers\.0|norm|out\.0)\.weight$', r'\1.scale'),
    )

    image_size: int
    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: Any = 2
    attention_resolutions: Sequence[int] = (32, 16)
    cond_lq: bool = True
    dropout: float = 0.
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_resample: bool = True
    num_classes: Optional[int] = None
    num_heads: int = 1
    num_head_channels: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, timesteps, y=None, lq=None, deterministic: bool = True):
        num_res_blocks = (self.num_res_blocks if isinstance(self.num_res_blocks, (list, tuple))
                          else [self.num_res_blocks] * len(self.channel_mult))
        time_embed_dim = self.model_channels * 4
        emb = timestep_embedding(timesteps, self.model_channels)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name='time_embed_0')(emb)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name='time_embed_2')(nn.silu(emb))
        if self.num_classes is not None:
            emb = emb + nn.Embed(self.num_classes, time_embed_dim, name='label_emb')(y)

        if lq is not None:
            assert self.cond_lq
            if lq.shape[1] != x.shape[1]:
                lq = resize_bicubic(lq, x.shape[1] / lq.shape[1])
            x = jnp.concatenate([x, lq], axis=-1)

        def res(name, ch_in, ch_out, **kw):
            return ResBlock(ch_in, time_embed_dim, self.dropout, out_channels=ch_out,
                            use_scale_shift_norm=self.use_scale_shift_norm,
                            dtype=self.dtype, name=name, **kw)

        def attn(name, ch):
            return AttentionBlock(ch, self.num_heads, self.num_head_channels,
                                  dtype=self.dtype, name=name)

        ch = input_ch = int(self.channel_mult[0] * self.model_channels)
        h = nn.Conv(ch, (3, 3), dtype=self.dtype, name='input_blocks_0_0')(x)
        hs = [h]
        input_block_chans = [ch]
        ds = self.image_size
        blk = 1
        for level, mult in enumerate(self.channel_mult):
            for _ in range(num_res_blocks[level]):
                h = res(f'input_blocks_{blk}_0', ch, int(mult * self.model_channels))(
                    h, emb, deterministic)
                ch = int(mult * self.model_channels)
                if ds in self.attention_resolutions:
                    h = attn(f'input_blocks_{blk}_1', ch)(h)
                hs.append(h)
                input_block_chans.append(ch)
                blk += 1
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = res(f'input_blocks_{blk}_0', ch, ch, down=True)(h, emb, deterministic)
                else:
                    h = ADMDownsample(ch, self.conv_resample, out_channels=ch,
                                      dtype=self.dtype, name=f'input_blocks_{blk}_0')(h)
                hs.append(h)
                input_block_chans.append(ch)
                ds //= 2
                blk += 1

        h = res('middle_block_0', ch, ch)(h, emb, deterministic)
        h = attn('middle_block_1', ch)(h)
        h = res('middle_block_2', ch, ch)(h, emb, deterministic)

        blk = 0
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(num_res_blocks[level] + 1):
                ich = input_block_chans.pop()
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = res(f'output_blocks_{blk}_0', ch + ich,
                        int(self.model_channels * mult))(h, emb, deterministic)
                ch = int(self.model_channels * mult)
                sub = 1
                if ds in self.attention_resolutions:
                    h = attn(f'output_blocks_{blk}_{sub}', ch)(h)
                    sub += 1
                if level and i == num_res_blocks[level]:
                    if self.resblock_updown:
                        h = res(f'output_blocks_{blk}_{sub}', ch, ch, up=True)(h, emb, deterministic)
                    else:
                        h = ADMUpsample(ch, self.conv_resample, out_channels=ch,
                                        dtype=self.dtype,
                                        name=f'output_blocks_{blk}_{sub}')(h)
                    ds *= 2
                blk += 1

        h = _group_norm('out_0', ch)(h)
        h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3), kernel_init=nn.initializers.zeros,
                       dtype=self.dtype, name='out_2')(h)


class ResBlockConv(nn.Module):
    """Norm-free residual block (SiLU-conv / FiLM emb / SiLU-zero-conv)
    (reference unet_arch.py:928-1019)."""
    channels: int
    emb_channels: int
    out_channels: Optional[int] = None
    use_conv: bool = False
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, emb):
        out_ch = self.out_channels or self.channels
        h = nn.silu(x)
        if self.up:
            h = resize_nearest(h, 2)
            x = resize_nearest(x, 2)
        elif self.down:
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        h = nn.Conv(out_ch, (3, 3), dtype=self.dtype, name='in_layers_1')(h)

        emb_out = nn.Dense(2 * out_ch if self.use_scale_shift_norm else out_ch,
                           dtype=self.dtype, name='emb_layers_1')(nn.silu(emb))
        emb_out = emb_out[:, None, None, :]
        if self.use_scale_shift_norm:
            # norm-free FiLM: modulation applies directly to the features
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = h * (1 + scale) + shift
        else:
            h = h + emb_out
        h = nn.silu(h)
        h = nn.Conv(out_ch, (3, 3), kernel_init=nn.initializers.zeros,
                    dtype=self.dtype, name='out_layers_1')(h)

        if out_ch == self.channels:
            skip = x
        elif self.use_conv:
            skip = nn.Conv(out_ch, (3, 3), dtype=self.dtype, name='skip_connection')(x)
        else:
            skip = nn.Conv(out_ch, (1, 1), dtype=self.dtype, name='skip_connection')(x)
        return skip + h


@ARCH_REGISTRY.register()
class UNetModelConv(nn.Module):
    """Attention-free, norm-free conv UNet with timestep embedding
    (reference unet_arch.py:1021-1196)."""
    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: Any = 2
    cond_lq: bool = True
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_resample: bool = True
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, timesteps, lq=None, deterministic: bool = True):
        num_res_blocks = (self.num_res_blocks if isinstance(self.num_res_blocks, (list, tuple))
                          else [self.num_res_blocks] * len(self.channel_mult))
        time_embed_dim = self.model_channels * 4
        emb = timestep_embedding(timesteps, self.model_channels)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name='time_embed_0')(emb)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name='time_embed_2')(nn.silu(emb))

        if lq is not None:
            assert self.cond_lq
            if lq.shape[1] != x.shape[1]:
                lq = pixel_unshuffle(lq, 2)
            x = jnp.concatenate([x, lq], axis=-1)

        def res(name, ch_in, ch_out, **kw):
            return ResBlockConv(ch_in, time_embed_dim, out_channels=ch_out,
                                use_scale_shift_norm=self.use_scale_shift_norm,
                                dtype=self.dtype, name=name, **kw)

        ch = int(self.channel_mult[0] * self.model_channels)
        h = nn.Conv(ch, (3, 3), dtype=self.dtype, name='input_blocks_0_0')(x)
        hs = [h]
        input_block_chans = [ch]
        blk = 1
        for level, mult in enumerate(self.channel_mult):
            for _ in range(num_res_blocks[level]):
                h = res(f'input_blocks_{blk}_0', ch, int(mult * self.model_channels))(h, emb)
                ch = int(mult * self.model_channels)
                hs.append(h)
                input_block_chans.append(ch)
                blk += 1
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = res(f'input_blocks_{blk}_0', ch, ch, down=True)(h, emb)
                else:
                    h = ADMDownsample(ch, self.conv_resample, out_channels=ch,
                                      dtype=self.dtype, name=f'input_blocks_{blk}_0')(h)
                hs.append(h)
                input_block_chans.append(ch)
                blk += 1

        h = res('middle_block_0', ch, ch)(h, emb)
        h = res('middle_block_1', ch, ch)(h, emb)

        blk = 0
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(num_res_blocks[level] + 1):
                ich = input_block_chans.pop()
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = res(f'output_blocks_{blk}_0', ch + ich,
                        int(self.model_channels * mult))(h, emb)
                ch = int(self.model_channels * mult)
                if level and i == num_res_blocks[level]:
                    if self.resblock_updown:
                        h = res(f'output_blocks_{blk}_1', ch, ch, up=True)(h, emb)
                    else:
                        h = ADMUpsample(ch, self.conv_resample, out_channels=ch,
                                        dtype=self.dtype, name=f'output_blocks_{blk}_1')(h)
                blk += 1

        h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name='out_1')(h)
