"""StyleGAN2 generator & discriminator
(reference: basicsr/archs/stylegan2_arch.py:12-799).

TPU-native notes: the three CUDA ops become XLA ops (ops/upfirdn2d.py,
ops/fused_act.py); per-sample modulated convolutions are expressed as
patch-extraction + one batched einsum (a single big MXU matmul per layer)
instead of torch's grouped-conv reshape trick. NHWC.

Parameter layout: modulated conv base weights keep the torch
(1, out, in, k, k) shape under the leaf name ``w_mod`` so reference
checkpoints convert without transposition (see TORCH_KEY_RULES).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.fused_act import FusedLeakyReLU, fused_leaky_relu, scaled_leaky_relu
from ..ops.upfirdn2d import (make_resample_kernel, upfirdn_downsample, upfirdn_smooth,
                             upfirdn_upsample)
from ..utils.registry import ARCH_REGISTRY


def normalize_style_code(x):
    """(reference stylegan2_arch.py:12-23)"""
    return x * jax.lax.rsqrt(jnp.mean(x**2, axis=1, keepdims=True) + 1e-8)


class EqualLinear(nn.Module):
    """(reference stylegan2_arch.py:134-180)"""
    in_channels: int
    out_channels: int
    use_bias: bool = True
    bias_init_val: float = 0.
    lr_mul: float = 1.
    activation: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        scale = (1 / math.sqrt(self.in_channels)) * self.lr_mul
        kernel = self.param('kernel',
                            lambda rng, shape: jax.random.normal(rng, shape) / self.lr_mul,
                            (self.in_channels, self.out_channels))
        bias = (self.param('bias', nn.initializers.constant(self.bias_init_val),
                           (self.out_channels,)) * self.lr_mul if self.use_bias else None)
        out = x @ (kernel * scale)
        if self.activation == 'fused_lrelu':
            return fused_leaky_relu(out, bias)
        if bias is not None:
            out = out + bias
        return out


def _per_sample_conv(x, w, stride: int = 1, padding='SAME', lhs_dilation: int = 1):
    """Per-sample conv: x (n,h,w,ci), w (n,ci,k*k,co) -> (n,oh,ow,co).

    Expressed as one grouped conv with ``batch_group_count=n`` (the torch
    reference's ``F.conv2d(groups=b)`` trick, stylegan2_arch.py:182-287):
    XLA maps each batch element onto its own filter group. An earlier
    patch-extraction + einsum formulation materialized the (n,oh,ow,ci*k*k)
    patch tensor — ~600 MB per 512-channel layer at 256px, all saved for
    the backward, which RESOURCE_EXHAUSTed a 16G chip on G fwd+bwd."""
    n, h, wd, cin = x.shape
    k = int(math.isqrt(w.shape[2]))
    co = w.shape[3]
    # (n, ci, k*k, co) -> HWIO (k, k, ci, n*co), group-major out features
    wt = w.reshape(n, cin, k, k, co).transpose(2, 3, 1, 0, 4)
    wt = wt.reshape(k, k, cin, n * co)
    out = jax.lax.conv_general_dilated(
        x, wt, (stride, stride), padding,
        lhs_dilation=(lhs_dilation, lhs_dilation),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        batch_group_count=n)
    oh, ow = out.shape[1], out.shape[2]
    return out.reshape(oh, ow, n, co).transpose(2, 0, 1, 3)


class ModulatedConv2d(nn.Module):
    """Style-modulated demodulated conv (reference stylegan2_arch.py:182-287)."""
    in_channels: int
    out_channels: int
    kernel_size: int
    num_style_feat: int
    demodulate: bool = True
    sample_mode: Optional[str] = None
    resample_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x, style):
        b = x.shape[0]
        k = self.kernel_size
        cin, cout = self.in_channels, self.out_channels
        scale = 1 / math.sqrt(cin * k**2)

        style = EqualLinear(self.num_style_feat, cin, bias_init_val=1,
                            name='modulation')(style)          # (b, cin)
        w_mod = self.param('w_mod', nn.initializers.normal(1.0), (1, cout, cin, k, k))
        weight = scale * w_mod * style[:, None, :, None, None]   # (b, co, ci, k, k)
        if self.demodulate:
            demod = jax.lax.rsqrt(jnp.sum(weight**2, axis=(2, 3, 4)) + self.eps)
            weight = weight * demod[:, :, None, None, None]

        smooth_kernel = make_resample_kernel(self.resample_kernel)
        if self.sample_mode == 'upsample':
            # conv_transpose stride 2: flip spatially, swap in/out, dilate input
            wt = jnp.flip(weight, (3, 4)).transpose(0, 2, 3, 4, 1)  # (b, ci, k, k, co)
            wt = wt.reshape(b, cin, k * k, cout)
            out = _per_sample_conv(x, wt, stride=1,
                                   padding=[(k - 1, k - 1), (k - 1, k - 1)], lhs_dilation=2)
            out = upfirdn_smooth(out, smooth_kernel, upsample_factor=2, kernel_size=k)
        elif self.sample_mode == 'downsample':
            x = upfirdn_smooth(x, smooth_kernel, downsample_factor=2, kernel_size=k)
            wt = weight.transpose(0, 2, 3, 4, 1).reshape(b, cin, k * k, cout)
            out = _per_sample_conv(x, wt, stride=2, padding='VALID')
        else:
            wt = weight.transpose(0, 2, 3, 4, 1).reshape(b, cin, k * k, cout)
            pad = k // 2
            out = _per_sample_conv(x, wt, stride=1, padding=[(pad, pad), (pad, pad)])
        return out


class StyleConv(nn.Module):
    """(reference stylegan2_arch.py:288-334)"""
    in_channels: int
    out_channels: int
    kernel_size: int
    num_style_feat: int
    demodulate: bool = True
    sample_mode: Optional[str] = None
    resample_kernel: Tuple[int, ...] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x, style, noise=None):
        out = ModulatedConv2d(self.in_channels, self.out_channels, self.kernel_size,
                              self.num_style_feat, self.demodulate, self.sample_mode,
                              self.resample_kernel, name='modulated_conv')(x, style)
        noise_weight = self.param('noise_weight', nn.initializers.zeros, (1,))
        if noise is None:
            n, h, w, _ = out.shape
            noise = jax.random.normal(self.make_rng('noise'), (n, h, w, 1), out.dtype)
        out = out + noise_weight * noise
        return FusedLeakyReLU(self.out_channels, name='activate')(out)


class ToRGB(nn.Module):
    """(reference stylegan2_arch.py:336-375)"""
    in_channels: int
    num_style_feat: int
    upsample: bool = True
    resample_kernel: Tuple[int, ...] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x, style, skip=None):
        out = ModulatedConv2d(self.in_channels, 3, 1, self.num_style_feat,
                              demodulate=False, sample_mode=None,
                              name='modulated_conv')(x, style)
        bias = self.param('bias', nn.initializers.zeros, (1, 3, 1, 1))
        out = out + bias.transpose(0, 2, 3, 1)
        if skip is not None:
            if self.upsample:
                skip = upfirdn_upsample(skip, make_resample_kernel(self.resample_kernel), 2)
            out = out + skip
        return out


def _channels(channel_multiplier: float, narrow: float = 1):
    return {
        '4': int(512 * narrow), '8': int(512 * narrow), '16': int(512 * narrow),
        '32': int(512 * narrow), '64': int(256 * channel_multiplier * narrow),
        '128': int(128 * channel_multiplier * narrow),
        '256': int(64 * channel_multiplier * narrow),
        '512': int(32 * channel_multiplier * narrow),
        '1024': int(16 * channel_multiplier * narrow),
    }


@ARCH_REGISTRY.register()
class StyleGAN2Generator(nn.Module):
    """(reference stylegan2_arch.py:395-586)"""
    TORCH_KEY_RULES = (
        (r'modulated_conv\.weight$', 'modulated_conv.w_mod'),
        (r'(style_conv1|style_convs\.\d+)\.weight$', r'\1.noise_weight'),
        (r'constant_input\.weight$', 'const'),
    )

    out_size: int
    num_style_feat: int = 512
    num_mlp: int = 8
    channel_multiplier: int = 2
    resample_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    lr_mlp: float = 0.01
    narrow: float = 1.

    @property
    def log_size(self):
        return int(math.log(self.out_size, 2))

    @property
    def num_layers(self):
        return (self.log_size - 2) * 2 + 1

    @property
    def num_latent(self):
        return self.log_size * 2 - 2

    @nn.compact
    def __call__(self, styles, input_is_latent: bool = False, noise=None,
                 randomize_noise: bool = True, truncation: float = 1.,
                 truncation_latent=None, inject_index: Optional[int] = None,
                 return_latents: bool = False):
        channels = _channels(self.channel_multiplier, self.narrow)
        # MLP layer instances are created once and reused across style codes
        mlp_layers = [EqualLinear(self.num_style_feat, self.num_style_feat,
                                  lr_mul=self.lr_mlp, activation='fused_lrelu',
                                  name=f'style_mlp_{i + 1}')
                      for i in range(self.num_mlp)]

        def style_mlp(x):
            x = normalize_style_code(x)
            for layer in mlp_layers:
                x = layer(x)
            return x

        if not isinstance(styles, (list, tuple)):
            styles = [styles]
        if not input_is_latent:
            styles = [style_mlp(s) for s in styles]

        if noise is None:
            if randomize_noise:
                noise = [None] * self.num_layers
            else:
                noise = [self.variable('noises', f'noise{i}',
                                       lambda i=i: jnp.zeros(
                                           (1, 2**((i + 5) // 2), 2**((i + 5) // 2), 1))).value
                         for i in range(self.num_layers)]
        if truncation < 1:
            styles = [truncation_latent + truncation * (s - truncation_latent) for s in styles]

        if len(styles) == 1:
            idx = self.num_latent
            latent = (jnp.repeat(styles[0][:, None], idx, axis=1)
                      if styles[0].ndim < 3 else styles[0])
        else:
            if inject_index is None:
                inject_index = self.num_latent // 2
            latent1 = jnp.repeat(styles[0][:, None], inject_index, axis=1)
            latent2 = jnp.repeat(styles[1][:, None], self.num_latent - inject_index, axis=1)
            latent = jnp.concatenate([latent1, latent2], axis=1)

        # stored in torch (1, C, 4, 4) layout for conversion parity
        const = self.param('const', nn.initializers.normal(1.0), (1, channels['4'], 4, 4))
        out = jnp.repeat(const.transpose(0, 2, 3, 1), latent.shape[0], axis=0)

        out = StyleConv(channels['4'], channels['4'], 3, self.num_style_feat,
                        resample_kernel=self.resample_kernel,
                        name='style_conv1')(out, latent[:, 0], noise=noise[0])
        skip = ToRGB(channels['4'], self.num_style_feat, upsample=False,
                     name='to_rgb1')(out, latent[:, 1])

        in_ch = channels['4']
        i = 1
        for li, res_log in enumerate(range(3, self.log_size + 1)):
            out_ch = channels[f'{2**res_log}']
            out = StyleConv(in_ch, out_ch, 3, self.num_style_feat, sample_mode='upsample',
                            resample_kernel=self.resample_kernel,
                            name=f'style_convs_{2 * li}')(out, latent[:, i], noise=noise[2 * li + 1])
            out = StyleConv(out_ch, out_ch, 3, self.num_style_feat, sample_mode=None,
                            resample_kernel=self.resample_kernel,
                            name=f'style_convs_{2 * li + 1}')(out, latent[:, i + 1],
                                                              noise=noise[2 * li + 2])
            skip = ToRGB(out_ch, self.num_style_feat, upsample=True,
                         name=f'to_rgbs_{li}')(out, latent[:, i + 2], skip)
            in_ch = out_ch
            i += 2

        if return_latents:
            return skip, latent
        return skip, None


class EqualConv2d(nn.Module):
    """(reference stylegan2_arch.py:605-652)"""
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    bias_init_val: float = 0.

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        scale = 1 / math.sqrt(self.in_channels * k**2)
        kernel = self.param('kernel', nn.initializers.normal(1.0),
                            (k, k, self.in_channels, self.out_channels))
        out = jax.lax.conv_general_dilated(
            x, kernel * scale, (self.stride, self.stride),
            [(self.padding, self.padding), (self.padding, self.padding)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        if self.use_bias:
            bias = self.param('bias', nn.initializers.constant(self.bias_init_val),
                              (self.out_channels,))
            out = out + bias
        return out


def conv_layer(scope, x, prefix, in_channels, out_channels, kernel_size,
               downsample=False, resample_kernel=(1, 3, 3, 1), use_bias=True,
               activate=True):
    """Conv (+ downsample smooth) + activation (reference :654-702), created
    in the CALLER's scope with torch-Sequential-fused names ``{prefix}_{i}``."""
    idx = 0
    if downsample:
        x = upfirdn_smooth(x, make_resample_kernel(resample_kernel),
                           downsample_factor=2, kernel_size=kernel_size)
        stride, padding, idx = 2, 0, 1
    else:
        stride, padding = 1, kernel_size // 2
    x = EqualConv2d(in_channels, out_channels, kernel_size, stride, padding,
                    use_bias=use_bias and not activate, name=f'{prefix}_{idx}')(x)
    if activate:
        if use_bias:
            x = FusedLeakyReLU(out_channels, name=f'{prefix}_{idx + 1}')(x)
        else:
            x = scaled_leaky_relu(x, 0.2)
    return x


class ResBlock(nn.Module):
    """(reference stylegan2_arch.py:704-733)"""
    in_channels: int
    out_channels: int
    resample_kernel: Tuple[int, ...] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x):
        out = conv_layer(self, x, 'conv1', self.in_channels, self.in_channels, 3)
        out = conv_layer(self, out, 'conv2', self.in_channels, self.out_channels, 3,
                         downsample=True, resample_kernel=self.resample_kernel)
        skip = conv_layer(self, x, 'skip', self.in_channels, self.out_channels, 1,
                          downsample=True, resample_kernel=self.resample_kernel,
                          use_bias=False, activate=False)
        return (out + skip) / math.sqrt(2)


@ARCH_REGISTRY.register()
class StyleGAN2Discriminator(nn.Module):
    """(reference stylegan2_arch.py:736-799)"""
    out_size: int
    channel_multiplier: int = 2
    resample_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    stddev_group: int = 4
    narrow: float = 1.

    @nn.compact
    def __call__(self, x):
        channels = _channels(self.channel_multiplier, self.narrow)
        log_size = int(math.log(self.out_size, 2))

        out = conv_layer(self, x, 'conv_body_0', 3, channels[f'{self.out_size}'], 1)
        in_ch = channels[f'{self.out_size}']
        for bi, i in enumerate(range(log_size, 2, -1)):
            out_ch = channels[f'{2**(i - 1)}']
            out = ResBlock(in_ch, out_ch, self.resample_kernel,
                           name=f'conv_body_{bi + 1}')(out)
            in_ch = out_ch

        b, h, w, c = out.shape
        group = min(b, self.stddev_group)
        stddev = out.reshape(group, -1, h, w, c)
        stddev = jnp.sqrt(jnp.var(stddev, axis=0) + 1e-8)      # (b//g, h, w, c)
        stddev = jnp.mean(stddev, axis=(1, 2, 3))              # scalar per sub-batch
        stddev = jnp.tile(stddev.reshape(-1, 1, 1, 1), (group, h, w, 1))
        out = jnp.concatenate([out, stddev], axis=-1)

        out = conv_layer(self, out, 'final_conv', in_ch + 1, channels['4'], 3)
        # flatten in torch NCHW order for linear-weight conversion parity
        out = out.transpose(0, 3, 1, 2).reshape(b, -1)
        out = EqualLinear(channels['4'] * 4 * 4, channels['4'], activation='fused_lrelu',
                          name='final_linear_0')(out)
        return EqualLinear(channels['4'], 1, name='final_linear_1')(out)
