"""HiFaceGAN generator + multiscale conditional discriminator
(reference: basicsr/archs/hifacegan_arch.py:10-260).

The SPADE generator's progressive-phase logic is a static Python loop
(``train_phase`` is config, not data), so the whole forward stays a single
XLA program. The multiscale discriminator returns nested lists of feature
maps (for feature-matching loss), which flow through jit as pytrees.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..utils.registry import ARCH_REGISTRY
from .arch_util import resize_nearest
from .hifacegan_util import (LIPEncoder, SNConv2d, SPADEResnetBlock, _avg_pool_3x3s2,
                             instance_norm, nearest_resize_to)


class SPADEGenerator(nn.Module):
    """(reference hifacegan_arch.py:10-142)"""
    num_in_ch: int = 3
    num_feat: int = 64
    use_vae: bool = False
    z_dim: int = 256
    crop_size: int = 512
    norm_g: str = 'spectralspadesyncbatch3x3'
    is_train: bool = True
    init_train_phase: int = 3
    dtype: Any = None

    scale_ratio: int = 5  # hardcoded in the reference too

    # torch's affine InstanceNorm inside SimplifiedLIP stores weight/bias;
    # flax GroupNorm names them scale/bias
    TORCH_KEY_RULES = ((r'logit\.1\.weight$', 'logit.1.scale'),)

    def setup(self):
        nf = self.num_feat
        self.fc = nn.Conv(16 * nf, (3, 3), padding=1, dtype=self.dtype)
        self.head_0 = SPADEResnetBlock(16 * nf, 16 * nf, self.norm_g, dtype=self.dtype)
        self.g_middle_0 = SPADEResnetBlock(16 * nf, 16 * nf, self.norm_g, dtype=self.dtype)
        self.g_middle_1 = SPADEResnetBlock(16 * nf, 16 * nf, self.norm_g, dtype=self.dtype)
        self.ups_0 = SPADEResnetBlock(16 * nf, 8 * nf, self.norm_g, dtype=self.dtype)
        self.ups_1 = SPADEResnetBlock(8 * nf, 4 * nf, self.norm_g, dtype=self.dtype)
        self.ups_2 = SPADEResnetBlock(4 * nf, 2 * nf, self.norm_g, dtype=self.dtype)
        self.ups_3 = SPADEResnetBlock(2 * nf, 1 * nf, self.norm_g, dtype=self.dtype)
        self.to_rgbs_0 = nn.Conv(3, (3, 3), padding=1, dtype=self.dtype)
        self.to_rgbs_1 = nn.Conv(3, (3, 3), padding=1, dtype=self.dtype)
        self.to_rgbs_2 = nn.Conv(3, (3, 3), padding=1, dtype=self.dtype)
        self.to_rgbs_3 = nn.Conv(3, (3, 3), padding=1, dtype=self.dtype)

    @property
    def _ups(self):
        return [self.ups_0, self.ups_1, self.ups_2, self.ups_3]

    @property
    def _to_rgbs(self):
        return [self.to_rgbs_0, self.to_rgbs_1, self.to_rgbs_2, self.to_rgbs_3]

    def encode(self, x):
        h, w = x.shape[1:3]
        sh, sw = h // 2**self.scale_ratio, w // 2**self.scale_ratio
        return self.fc(nearest_resize_to(x, (sh, sw)))

    def _phase(self):
        return self.init_train_phase + 1 if self.is_train else 4

    def __call__(self, x):
        seg = x
        x = self.encode(x)
        x = self.head_0(x, seg)
        x = resize_nearest(x, 2)
        x = self.g_middle_0(x, seg)
        x = self.g_middle_1(x, seg)
        phase = self._phase()
        for i in range(phase):
            x = resize_nearest(x, 2)
            x = self._ups[i](x, seg)
        x = self._to_rgbs[phase - 1](nn.leaky_relu(x, 0.2))
        return jnp.tanh(x)

    def mixed_guidance_forward(self, input_x, seg=None, n=0, mode='progressive'):
        """Subspace visualization helper (reference hifacegan_arch.py:96-142)."""
        if seg is None:
            return self(input_x)
        phase = self._phase()
        if mode == 'progressive':
            n = max(min(n, 4 + phase), 0)
            guide_list = [input_x] * n + [seg] * (4 + phase - n)
        elif mode == 'one_plug':
            n = max(min(n, 4 + phase - 1), 0)
            guide_list = [seg] * (4 + phase)
            guide_list[n] = input_x
        elif mode == 'one_ablate':
            if n > 3 + phase:
                return self(input_x)
            guide_list = [input_x] * (4 + phase)
            guide_list[n] = seg
        x = self.encode(guide_list[0])
        x = self.head_0(x, guide_list[1])
        x = resize_nearest(x, 2)
        x = self.g_middle_0(x, guide_list[2])
        x = self.g_middle_1(x, guide_list[3])
        for i in range(phase):
            x = resize_nearest(x, 2)
            x = self._ups[i](x, guide_list[4 + i])
        x = self._to_rgbs[phase - 1](nn.leaky_relu(x, 0.2))
        return jnp.tanh(x)


ARCH_REGISTRY.register(SPADEGenerator)


@ARCH_REGISTRY.register()
class HiFaceGAN(SPADEGenerator):
    """SPADE generator with a learnable LIP encoder
    (reference hifacegan_arch.py:145-165)."""

    def setup(self):
        super().setup()
        sw = self.crop_size // 2**self.scale_ratio
        self.lip_encoder = LIPEncoder(self.num_in_ch, self.num_feat, sw, sw,
                                      self.scale_ratio, dtype=self.dtype)

    def encode(self, x):
        return self.lip_encoder(x)


class NLayerDiscriminator(nn.Module):
    """PatchGAN discriminator with intermediate-feature outputs
    (reference hifacegan_arch.py:223-260). Norm layer is spectral+instance
    (the reference's default ``spectralinstance``)."""
    input_nc: int
    n_layers_d: int = 4
    num_feat: int = 64
    norm_d: str = 'spectralinstance'
    keep_features: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        use_sn = self.norm_d.startswith('spectral')
        sub = self.norm_d[len('spectral'):] if use_sn else self.norm_d
        nf = self.num_feat
        results = [x]
        # group 0: plain conv (stride 2, k4, pad 2) + lrelu
        h = nn.Conv(nf, (4, 4), strides=2, padding=2, dtype=self.dtype,
                    name='model0_0')(results[-1])
        results.append(nn.leaky_relu(h, 0.2))
        for n in range(1, self.n_layers_d):
            nf_prev, nf = nf, min(nf * 2, 512)
            stride = 1 if n == self.n_layers_d - 1 else 2
            name = f'model{n}_0_0' if use_sn else f'model{n}_0'
            if use_sn:
                h = SNConv2d(nf, 4, stride, 2, use_bias=False, dtype=self.dtype,
                             name=name)(results[-1])
            else:
                h = nn.Conv(nf, (4, 4), strides=stride, padding=2, use_bias=False,
                            dtype=self.dtype, name=name)(results[-1])
            if sub in ('instance', 'sync_batch'):
                h = instance_norm(h)
            elif sub == 'batch':
                mean = jnp.mean(h, axis=(0, 1, 2), keepdims=True)
                var = jnp.var(h, axis=(0, 1, 2), keepdims=True)
                h = (h - mean) / jnp.sqrt(var + 1e-5)
            results.append(nn.leaky_relu(h, 0.2))
        h = nn.Conv(1, (4, 4), strides=1, padding=2, dtype=self.dtype,
                    name=f'model{self.n_layers_d}_0')(results[-1])
        results.append(h)
        return results[1:] if self.keep_features else results[-1]


@ARCH_REGISTRY.register()
class HiFaceGANDiscriminator(nn.Module):
    """Multiscale conditional patch discriminator
    (reference hifacegan_arch.py:167-221). Returns a list (one per scale)
    of lists of intermediate features."""
    num_in_ch: int = 3
    num_out_ch: int = 3
    conditional_d: bool = True
    num_d: int = 2
    n_layers_d: int = 4
    num_feat: int = 64
    norm_d: str = 'spectralinstance'
    keep_features: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        input_nc = self.num_in_ch + (self.num_out_ch if self.conditional_d else 0)
        result = []
        for i in range(self.num_d):
            out = NLayerDiscriminator(input_nc, self.n_layers_d, self.num_feat,
                                      self.norm_d, self.keep_features,
                                      dtype=self.dtype, name=f'discriminator_{i}')(x)
            result.append(out)
            x = _avg_pool_3x3s2(x, count_include_pad=False)
        return result
