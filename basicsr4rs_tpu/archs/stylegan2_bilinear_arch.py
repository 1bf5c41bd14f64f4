"""StyleGAN2 bilinear variant — FIR (upfirdn) resampling replaced by
bilinear interpolation (reference: basicsr/archs/stylegan2_bilinear_arch.py:
73-614). Used where the upfirdn kernels are undesirable (e.g. export or
GFPGAN-style encoders).

Same parameter naming as ``stylegan2_arch`` so the shared TORCH_KEY_RULES
apply (``w_mod``/``noise_weight``/``const``). Resampling is a gather-based
torch-exact bilinear (antialias-free), which XLA lowers to cheap dynamic
slices fused with the surrounding convs.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.fused_act import FusedLeakyReLU, scaled_leaky_relu
from ..utils.registry import ARCH_REGISTRY
from .arch_util import resize_bilinear, resize_nearest
from .stylegan2_arch import EqualConv2d, EqualLinear, _channels, _per_sample_conv, normalize_style_code


def _interp(x, scale: float, mode: str):
    th, tw = int(x.shape[1] * scale), int(x.shape[2] * scale)
    if mode == 'nearest':
        if scale >= 1:
            return resize_nearest(x, int(scale))
        from .hifacegan_util import nearest_resize_to
        return nearest_resize_to(x, (th, tw))
    return resize_bilinear(x, th, tw)


class ModulatedConv2dBilinear(nn.Module):
    """(reference stylegan2_bilinear_arch.py:73-162): interpolate, then a
    stride-1 modulated conv (no FIR smoothing, no transpose conv)."""
    in_channels: int
    out_channels: int
    kernel_size: int
    num_style_feat: int
    demodulate: bool = True
    sample_mode: Optional[str] = None
    interpolation_mode: str = 'bilinear'
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x, style):
        b = x.shape[0]
        k = self.kernel_size
        cin, cout = self.in_channels, self.out_channels
        scale = 1 / math.sqrt(cin * k**2)

        style = EqualLinear(self.num_style_feat, cin, bias_init_val=1,
                            name='modulation')(style)
        w_mod = self.param('w_mod', nn.initializers.normal(1.0), (1, cout, cin, k, k))
        weight = scale * w_mod * style[:, None, :, None, None]
        if self.demodulate:
            demod = jax.lax.rsqrt(jnp.sum(weight**2, axis=(2, 3, 4)) + self.eps)
            weight = weight * demod[:, :, None, None, None]

        if self.sample_mode == 'upsample':
            x = _interp(x, 2.0, self.interpolation_mode)
        elif self.sample_mode == 'downsample':
            x = _interp(x, 0.5, self.interpolation_mode)

        wt = weight.transpose(0, 2, 3, 4, 1).reshape(b, cin, k * k, cout)
        pad = k // 2
        return _per_sample_conv(x, wt, stride=1, padding=[(pad, pad), (pad, pad)])


class StyleConvBilinear(nn.Module):
    """(reference stylegan2_bilinear_arch.py:163-207)"""
    in_channels: int
    out_channels: int
    kernel_size: int
    num_style_feat: int
    demodulate: bool = True
    sample_mode: Optional[str] = None
    interpolation_mode: str = 'bilinear'

    @nn.compact
    def __call__(self, x, style, noise=None):
        out = ModulatedConv2dBilinear(self.in_channels, self.out_channels,
                                      self.kernel_size, self.num_style_feat,
                                      self.demodulate, self.sample_mode,
                                      self.interpolation_mode,
                                      name='modulated_conv')(x, style)
        noise_weight = self.param('noise_weight', nn.initializers.zeros, (1,))
        if noise is None:
            n, h, w, _ = out.shape
            noise = jax.random.normal(self.make_rng('noise'), (n, h, w, 1), out.dtype)
        out = out + noise_weight * noise
        return FusedLeakyReLU(self.out_channels, name='activate')(out)


class ToRGBBilinear(nn.Module):
    """(reference stylegan2_bilinear_arch.py:209-255)"""
    in_channels: int
    num_style_feat: int
    upsample: bool = True
    interpolation_mode: str = 'bilinear'

    @nn.compact
    def __call__(self, x, style, skip=None):
        out = ModulatedConv2dBilinear(self.in_channels, 3, 1, self.num_style_feat,
                                      demodulate=False, sample_mode=None,
                                      interpolation_mode=self.interpolation_mode,
                                      name='modulated_conv')(x, style)
        bias = self.param('bias', nn.initializers.zeros, (1, 3, 1, 1))
        out = out + bias.transpose(0, 2, 3, 1)
        if skip is not None:
            if self.upsample:
                skip = _interp(skip, 2.0, self.interpolation_mode)
            out = out + skip
        return out


@ARCH_REGISTRY.register()
class StyleGAN2GeneratorBilinear(nn.Module):
    """(reference stylegan2_bilinear_arch.py:274-464)"""
    TORCH_KEY_RULES = (
        (r'modulated_conv\.weight$', 'modulated_conv.w_mod'),
        (r'(style_conv1|style_convs\.\d+)\.weight$', r'\1.noise_weight'),
        (r'constant_input\.weight$', 'const'),
    )

    out_size: int
    num_style_feat: int = 512
    num_mlp: int = 8
    channel_multiplier: int = 2
    lr_mlp: float = 0.01
    narrow: float = 1.
    interpolation_mode: str = 'bilinear'

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

        const = self.param('const', nn.initializers.normal(1.0), (1, channels['4'], 4, 4))
        out = jnp.repeat(const.transpose(0, 2, 3, 1), latent.shape[0], axis=0)

        out = StyleConvBilinear(channels['4'], channels['4'], 3, self.num_style_feat,
                                interpolation_mode=self.interpolation_mode,
                                name='style_conv1')(out, latent[:, 0], noise=noise[0])
        skip = ToRGBBilinear(channels['4'], self.num_style_feat, upsample=False,
                             interpolation_mode=self.interpolation_mode,
                             name='to_rgb1')(out, latent[:, 1])

        in_ch = channels['4']
        i = 1
        for li, res_log in enumerate(range(3, self.log_size + 1)):
            out_ch = channels[f'{2**res_log}']
            out = StyleConvBilinear(in_ch, out_ch, 3, self.num_style_feat,
                                    sample_mode='upsample',
                                    interpolation_mode=self.interpolation_mode,
                                    name=f'style_convs_{2 * li}')(
                out, latent[:, i], noise=noise[2 * li + 1])
            out = StyleConvBilinear(out_ch, out_ch, 3, self.num_style_feat,
                                    sample_mode=None,
                                    interpolation_mode=self.interpolation_mode,
                                    name=f'style_convs_{2 * li + 1}')(
                out, latent[:, i + 1], noise=noise[2 * li + 2])
            skip = ToRGBBilinear(out_ch, self.num_style_feat, upsample=True,
                                 interpolation_mode=self.interpolation_mode,
                                 name=f'to_rgbs_{li}')(out, latent[:, i + 2], skip)
            in_ch = out_ch
            i += 2

        if return_latents:
            return skip, latent
        return skip, None


def conv_layer_bilinear(scope, x, prefix, in_channels, out_channels, kernel_size,
                        downsample=False, use_bias=True, activate=True,
                        interpolation_mode='bilinear'):
    """ConvLayer (reference stylegan2_bilinear_arch.py:531-577): optional 0.5x
    interpolation, then stride-1 EqualConv2d (+ activation). Names follow the
    torch Sequential indices."""
    idx = 0
    if downsample:
        x = _interp(x, 0.5, interpolation_mode)
        idx = 1
    x = EqualConv2d(in_channels, out_channels, kernel_size, 1, kernel_size // 2,
                    use_bias=use_bias and not activate, name=f'{prefix}_{idx}')(x)
    if activate:
        if use_bias:
            x = FusedLeakyReLU(out_channels, name=f'{prefix}_{idx + 1}')(x)
        else:
            x = scaled_leaky_relu(x, 0.2)
    return x


class ResBlockBilinear(nn.Module):
    """(reference stylegan2_bilinear_arch.py:580-614)"""
    in_channels: int
    out_channels: int
    interpolation_mode: str = 'bilinear'

    @nn.compact
    def __call__(self, x):
        out = conv_layer_bilinear(self, x, 'conv1', self.in_channels, self.in_channels, 3)
        out = conv_layer_bilinear(self, out, 'conv2', self.in_channels, self.out_channels,
                                  3, downsample=True,
                                  interpolation_mode=self.interpolation_mode)
        skip = conv_layer_bilinear(self, x, 'skip', self.in_channels, self.out_channels,
                                   1, downsample=True, use_bias=False, activate=False,
                                   interpolation_mode=self.interpolation_mode)
        return (out + skip) / math.sqrt(2)
