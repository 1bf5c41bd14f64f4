"""SR3 — diffusion SR UNet with continuous noise-level conditioning
(reference: basicsr/archs/sr3_arch.py:26-380)."""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..utils.registry import ARCH_REGISTRY
from .arch_util import resize_nearest


def make_beta_schedule(schedule: str, n_timestep: int, linear_start: float = 1e-4,
                       linear_end: float = 2e-2, cosine_s: float = 8e-3) -> np.ndarray:
    """(reference sr3_arch.py:34-65)"""
    if schedule == 'quad':
        return np.linspace(linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64)**2
    if schedule == 'linear':
        return np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    if schedule == 'warmup10' or schedule == 'warmup50':
        frac = 0.1 if schedule == 'warmup10' else 0.5
        betas = linear_end * np.ones(n_timestep, dtype=np.float64)
        warm = int(n_timestep * frac)
        betas[:warm] = np.linspace(linear_start, linear_end, warm, dtype=np.float64)
        return betas
    if schedule == 'const':
        return linear_end * np.ones(n_timestep, dtype=np.float64)
    if schedule == 'jsd':
        return 1. / np.linspace(n_timestep, 1, n_timestep, dtype=np.float64)
    if schedule == 'cosine':
        t = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = np.cos(t / (1 + cosine_s) * math.pi / 2)**2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        return np.clip(betas, None, 0.999)
    raise NotImplementedError(schedule)


def positional_encoding(noise_level, dim: int):
    """(reference sr3_arch.py:68-83)"""
    count = dim // 2
    step = jnp.arange(count, dtype=noise_level.dtype) / count
    enc = noise_level[:, None] * jnp.exp(-math.log(1e4) * step[None])
    return jnp.concatenate([jnp.sin(enc), jnp.cos(enc)], axis=-1)


def _swish(x):
    return x * jax.nn.sigmoid(x)


class _Block(nn.Module):
    """GroupNorm-Swish-(Dropout)-Conv (reference sr3_arch.py:131-142)."""
    dim_out: int
    groups: int = 32
    dropout: float = 0.
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.GroupNorm(num_groups=min(self.groups, x.shape[-1]), name='norm')(x)
        h = _swish(h)
        if self.dropout:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Conv(self.dim_out, (3, 3), dtype=self.dtype, name='conv')(h)


class _ResnetBlockAttn(nn.Module):
    """ResnetBlock (FiLM noise conditioning) + optional self-attention
    (reference sr3_arch.py:145-210)."""
    dim: int
    dim_out: int
    emb_dim: int
    norm_groups: int = 32
    dropout: float = 0.
    with_attn: bool = False
    use_affine_level: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, t_emb, deterministic: bool = True):
        h = _Block(self.dim_out, self.norm_groups, dtype=self.dtype, name='block1')(x)
        noise = nn.Dense(self.dim_out * (2 if self.use_affine_level else 1),
                         dtype=self.dtype, name='noise_func')(t_emb)[:, None, None, :]
        if self.use_affine_level:
            gamma, beta = jnp.split(noise, 2, axis=-1)
            h = (1 + gamma) * h + beta
        else:
            h = h + noise
        h = _Block(self.dim_out, self.norm_groups, self.dropout, dtype=self.dtype,
                   name='block2')(h, deterministic)
        if self.dim != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype, name='res_conv')(x)
        out = h + x

        if self.with_attn:
            n, hh, ww, c = out.shape
            norm = nn.GroupNorm(num_groups=min(self.norm_groups, c), name='attn_norm')(out)
            qkv = nn.Conv(c * 3, (1, 1), use_bias=False, dtype=self.dtype, name='attn_qkv')(norm)
            q, k, v = jnp.split(qkv.reshape(n, hh * ww, 3 * c), 3, axis=-1)
            attn = jax.nn.softmax(jnp.einsum('nqc,nkc->nqk', q, k) / math.sqrt(c), axis=-1)
            a = jnp.einsum('nqk,nkc->nqc', attn, v).reshape(n, hh, ww, c)
            out = out + nn.Conv(c, (1, 1), dtype=self.dtype, name='attn_out')(a)
        return out


@ARCH_REGISTRY.register()
class SR3UNet(nn.Module):
    """(reference sr3_arch.py:212-318, class UNet)"""
    TORCH_KEY_RULES = (
        (r'\.res_block\.', '.'),
        (r'(block[12])\.block\.0\.weight$', r'\1.norm.scale'),
        (r'(block[12])\.block\.0\.bias$', r'\1.norm.bias'),
        (r'(block[12])\.block\.3\.', r'\1.conv.'),
        (r'final_conv\.block\.0\.weight$', 'final_conv.norm.scale'),
        (r'final_conv\.block\.0\.bias$', 'final_conv.norm.bias'),
        (r'final_conv\.block\.3\.', 'final_conv.conv.'),
        (r'noise_func\.noise_func\.0\.', 'noise_func.'),
        (r'\.attn\.norm\.weight$', '.attn_norm.scale'),
        (r'\.attn\.norm\.bias$', '.attn_norm.bias'),
        (r'\.attn\.qkv\.', '.attn_qkv.'),
        (r'\.attn\.out\.', '.attn_out.'),
        (r'(downs|ups)\.(\d+)\.conv\.', r'\1.\2.'),
        (r'noise_level_mlp\.', 'noise_mlp_'),
    )

    in_channel: int = 6
    out_channel: int = 3
    inner_channel: int = 32
    norm_groups: int = 32
    channel_mults: Sequence[int] = (1, 2, 4, 8, 8)
    attn_res: Sequence[int] = (8,)
    res_blocks: int = 3
    dropout: float = 0.
    with_noise_level_emb: bool = True
    image_size: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, x, time, deterministic: bool = True):
        if self.with_noise_level_emb:
            t = positional_encoding(time, self.inner_channel)
            t = nn.Dense(self.inner_channel * 4, dtype=self.dtype, name='noise_mlp_1')(t)
            t = nn.Dense(self.inner_channel, dtype=self.dtype, name='noise_mlp_3')(_swish(t))
        else:
            t = None

        num_mults = len(self.channel_mults)
        pre = self.inner_channel
        feats = []
        now_res = self.image_size

        h = nn.Conv(self.inner_channel, (3, 3), dtype=self.dtype, name='downs_0')(x)
        feats.append(h)
        feat_channels = [pre]
        blk = 1
        for ind in range(num_mults):
            is_last = ind == num_mults - 1
            use_attn = now_res in self.attn_res
            ch = self.inner_channel * self.channel_mults[ind]
            for _ in range(self.res_blocks):
                h = _ResnetBlockAttn(pre, ch, self.inner_channel, self.norm_groups,
                                     self.dropout, use_attn, dtype=self.dtype,
                                     name=f'downs_{blk}')(h, t, deterministic)
                feats.append(h)
                feat_channels.append(ch)
                pre = ch
                blk += 1
            if not is_last:
                h = nn.Conv(pre, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name=f'downs_{blk}')(h)
                feats.append(h)
                feat_channels.append(pre)
                now_res //= 2
                blk += 1

        h = _ResnetBlockAttn(pre, pre, self.inner_channel, self.norm_groups, self.dropout,
                             True, dtype=self.dtype, name='mid_0')(h, t, deterministic)
        h = _ResnetBlockAttn(pre, pre, self.inner_channel, self.norm_groups, self.dropout,
                             False, dtype=self.dtype, name='mid_1')(h, t, deterministic)

        blk = 0
        for ind in reversed(range(num_mults)):
            is_last = ind < 1
            use_attn = now_res in self.attn_res
            ch = self.inner_channel * self.channel_mults[ind]
            for _ in range(self.res_blocks + 1):
                skip = feats.pop()
                feat_channels.pop()
                h = _ResnetBlockAttn(pre + skip.shape[-1], ch, self.inner_channel,
                                     self.norm_groups, self.dropout, use_attn,
                                     dtype=self.dtype, name=f'ups_{blk}')(
                    jnp.concatenate([h, skip], axis=-1), t, deterministic)
                pre = ch
                blk += 1
            if not is_last:
                h = nn.Conv(pre, (3, 3), dtype=self.dtype, name=f'ups_{blk}')(resize_nearest(h, 2))
                now_res *= 2
                blk += 1

        return _Block(self.out_channel, self.norm_groups, dtype=self.dtype,
                      name='final_conv')(h)


@ARCH_REGISTRY.register()
class SR3(nn.Module):
    """SR3 wrapper holding the UNet + the DDPM beta schedule tables
    (reference sr3_arch.py:319-380). Sampling/training logic lives in the
    owning model; the schedule is exposed via ``make_schedule``."""
    unet_opt: dict
    schedule_opt: dict
    in_channels: int = 3
    image_size: int = 512
    conditional: bool = True
    dtype: Any = None

    def setup(self):
        self.unet = SR3UNet(dtype=self.dtype, **self.unet_opt)

    def make_schedule(self):
        betas = make_beta_schedule(
            schedule=self.schedule_opt['schedule'],
            n_timestep=self.schedule_opt['n_timestep'],
            linear_start=self.schedule_opt.get('linear_start', 1e-4),
            linear_end=self.schedule_opt.get('linear_end', 2e-2))
        alphas = 1. - betas
        alphas_cumprod = np.cumprod(alphas, axis=0)
        alphas_cumprod_prev = np.append(1., alphas_cumprod[:-1])
        posterior_variance = betas * (1. - alphas_cumprod_prev) / (1. - alphas_cumprod)
        return {
            'betas': betas,
            'alphas_cumprod': alphas_cumprod,
            'alphas_cumprod_prev': alphas_cumprod_prev,
            'sqrt_alphas_cumprod_prev': np.sqrt(np.append(1., alphas_cumprod)),
            'sqrt_alphas_cumprod': np.sqrt(alphas_cumprod),
            'sqrt_one_minus_alphas_cumprod': np.sqrt(1. - alphas_cumprod),
            'sqrt_recip_alphas_cumprod': np.sqrt(1. / alphas_cumprod),
            'sqrt_recipm1_alphas_cumprod': np.sqrt(1. / alphas_cumprod - 1),
            'posterior_variance': posterior_variance,
            'posterior_log_variance_clipped': np.log(np.maximum(posterior_variance, 1e-20)),
            'posterior_mean_coef1': betas * np.sqrt(alphas_cumprod_prev) / (1. - alphas_cumprod),
            'posterior_mean_coef2': (1. - alphas_cumprod_prev) * np.sqrt(alphas) / (1. - alphas_cumprod),
        }

    def __call__(self, x, time, deterministic: bool = True):
        return self.unet(x, time, deterministic)
