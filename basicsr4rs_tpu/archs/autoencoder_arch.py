"""First-stage autoencoders for ResShift latent diffusion
(reference: basicsr/archs/autoencoder_arch.py:16-146 with internals in
archs/resshift/{model,quantize,distributions}.py).

LDM-style Encoder/Decoder (GroupNorm32 + swish ResnetBlocks, vanilla mid
attention, asymmetric-pad downsample), VectorQuantizer with straight-through
estimator, and a diagonal-Gaussian KL head. LoRA decoder tuning from the
reference is a torch-specific fine-tuning convenience and is not ported.
NHWC; submodule names mirror the torch keys under iterative digit-fusing.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..utils.registry import ARCH_REGISTRY
from .arch_util import resize_nearest


def _norm(name, ch):
    return nn.GroupNorm(num_groups=min(32, ch), epsilon=1e-6, name=name)


def _swish(x):
    return x * jax.nn.sigmoid(x)


class ResnetBlock(nn.Module):
    """(reference resshift/model.py:90-140)"""
    in_channels: int
    out_channels: Optional[int] = None
    conv_shortcut: bool = False
    dropout: float = 0.
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_ch = self.out_channels or self.in_channels
        h = _swish(_norm('norm1', self.in_channels)(x))
        h = nn.Conv(out_ch, (3, 3), dtype=self.dtype, name='conv1')(h)
        h = _swish(_norm('norm2', out_ch)(h))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(out_ch, (3, 3), dtype=self.dtype, name='conv2')(h)
        if out_ch != self.in_channels:
            if self.conv_shortcut:
                x = nn.Conv(out_ch, (3, 3), dtype=self.dtype, name='conv_shortcut')(x)
            else:
                x = nn.Conv(out_ch, (1, 1), dtype=self.dtype, name='nin_shortcut')(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial attention (reference resshift/model.py:147-204)."""
    in_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        hn = _norm('norm', c)(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name='q')(hn).reshape(n, h * w, c)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name='k')(hn).reshape(n, h * w, c)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name='v')(hn).reshape(n, h * w, c)
        attn = jax.nn.softmax(jnp.einsum('nqc,nkc->nqk', q, k) * (c ** -0.5), axis=-1)
        out = jnp.einsum('nqk,nkc->nqc', attn, v).reshape(n, h, w, c)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name='proj_out')(out)
        return x + out


class Encoder(nn.Module):
    """(reference resshift/model.py:452-550)"""
    ch: int
    out_ch: int
    ch_mult: Sequence[int]
    num_res_blocks: Any
    attn_resolutions: Sequence[int]
    in_channels: int
    resolution: int
    z_channels: int
    dropout: float = 0.
    resamp_with_conv: bool = True
    double_z: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        num_res_blocks = (self.num_res_blocks if isinstance(self.num_res_blocks, (list, tuple))
                          else [self.num_res_blocks] * len(self.ch_mult))
        num_resolutions = len(self.ch_mult)
        in_ch_mult = (1,) + tuple(self.ch_mult)

        h = nn.Conv(self.ch, (3, 3), dtype=self.dtype, name='conv_in')(x)
        curr_res = self.resolution
        for i_level in range(num_resolutions):
            block_in = self.ch * in_ch_mult[i_level]
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(num_res_blocks[i_level]):
                h = ResnetBlock(block_in, block_out, dropout=self.dropout, dtype=self.dtype,
                                name=f'down_{i_level}_block_{i_block}')(h, deterministic)
                block_in = block_out
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(block_in, dtype=self.dtype,
                                  name=f'down_{i_level}_attn_{i_block}')(h)
            if i_level != num_resolutions - 1:
                if self.resamp_with_conv:
                    # asymmetric (0,1,0,1) pad + stride-2 VALID conv
                    hp = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                    h = nn.Conv(block_in, (3, 3), strides=(2, 2), padding='VALID',
                                dtype=self.dtype, name=f'down_{i_level}_downsample_conv')(hp)
                else:
                    h = nn.avg_pool(h, (2, 2), strides=(2, 2))
                curr_res //= 2

        h = ResnetBlock(block_in, block_in, dropout=self.dropout, dtype=self.dtype,
                        name='mid_block_1')(h, deterministic)
        h = AttnBlock(block_in, dtype=self.dtype, name='mid_attn_1')(h)
        h = ResnetBlock(block_in, block_in, dropout=self.dropout, dtype=self.dtype,
                        name='mid_block_2')(h, deterministic)

        h = _swish(_norm('norm_out', block_in)(h))
        out_c = 2 * self.z_channels if self.double_z else self.z_channels
        return nn.Conv(out_c, (3, 3), dtype=self.dtype, name='conv_out')(h)


class Decoder(nn.Module):
    """(reference resshift/model.py:550-640)"""
    ch: int
    out_ch: int
    ch_mult: Sequence[int]
    num_res_blocks: Any
    attn_resolutions: Sequence[int]
    in_channels: int
    resolution: int
    z_channels: int
    dropout: float = 0.
    resamp_with_conv: bool = True
    give_pre_end: bool = False
    tanh_out: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, z, deterministic: bool = True):
        num_res_blocks = (self.num_res_blocks if isinstance(self.num_res_blocks, (list, tuple))
                          else [self.num_res_blocks] * len(self.ch_mult))
        num_resolutions = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[num_resolutions - 1]
        curr_res = self.resolution // 2 ** (num_resolutions - 1)

        h = nn.Conv(block_in, (3, 3), dtype=self.dtype, name='conv_in')(z)
        h = ResnetBlock(block_in, block_in, dropout=self.dropout, dtype=self.dtype,
                        name='mid_block_1')(h, deterministic)
        h = AttnBlock(block_in, dtype=self.dtype, name='mid_attn_1')(h)
        h = ResnetBlock(block_in, block_in, dropout=self.dropout, dtype=self.dtype,
                        name='mid_block_2')(h, deterministic)

        for i_level in reversed(range(num_resolutions)):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(num_res_blocks[i_level] + 1):
                h = ResnetBlock(block_in, block_out, dropout=self.dropout, dtype=self.dtype,
                                name=f'up_{i_level}_block_{i_block}')(h, deterministic)
                block_in = block_out
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(block_in, dtype=self.dtype,
                                  name=f'up_{i_level}_attn_{i_block}')(h)
            if i_level != 0:
                h = resize_nearest(h, 2)
                if self.resamp_with_conv:
                    h = nn.Conv(block_in, (3, 3), dtype=self.dtype,
                                name=f'up_{i_level}_upsample_conv')(h)
                curr_res *= 2

        if self.give_pre_end:
            return h
        h = _swish(_norm('norm_out', block_in)(h))
        h = nn.Conv(self.out_ch, (3, 3), dtype=self.dtype, name='conv_out')(h)
        return jnp.tanh(h) if self.tanh_out else h


class VectorQuantizer(nn.Module):
    """Nearest-codebook quantizer with straight-through gradients
    (reference resshift/quantize.py:213-310, VectorQuantizer2)."""
    n_e: int
    e_dim: int
    beta: float = 0.25

    @nn.compact
    def __call__(self, z):
        emb = self.param('embedding', nn.initializers.uniform(scale=2.0 / self.n_e),
                         (self.n_e, self.e_dim))
        flat = z.reshape(-1, self.e_dim)
        d = (jnp.sum(flat**2, axis=1, keepdims=True)
             - 2 * flat @ emb.T + jnp.sum(emb**2, axis=1)[None])
        idx = jnp.argmin(d, axis=1)
        z_q = emb[idx].reshape(z.shape)
        loss = (self.beta * jnp.mean((jax.lax.stop_gradient(z_q) - z)**2)
                + jnp.mean((z_q - jax.lax.stop_gradient(z))**2))
        z_q = z + jax.lax.stop_gradient(z_q - z)  # straight-through
        return z_q, loss, idx.reshape(z.shape[:-1])

    def embed_code(self, code):
        emb = self.get_variable('params', 'embedding')
        return emb[code]


class DiagonalGaussianDistribution:
    """(reference resshift/distributions.py:24-76)"""

    def __init__(self, parameters):
        self.parameters = parameters
        self.mean, self.logvar = jnp.split(parameters, 2, axis=-1)
        self.logvar = jnp.clip(self.logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)

    def sample(self, key):
        return self.mean + self.std * jax.random.normal(key, self.mean.shape,
                                                        self.mean.dtype)

    def mode(self):
        return self.mean

    def kl(self, other=None):
        if other is None:
            return 0.5 * jnp.sum(self.mean**2 + self.var - 1.0 - self.logvar,
                                 axis=tuple(range(1, self.mean.ndim)))
        return 0.5 * jnp.sum((self.mean - other.mean)**2 / other.var
                             + self.var / other.var - 1.0 - self.logvar + other.logvar,
                             axis=tuple(range(1, self.mean.ndim)))

    def nll(self, sample):
        logtwopi = np.log(2.0 * np.pi)
        return 0.5 * jnp.sum(logtwopi + self.logvar + (sample - self.mean)**2 / self.var,
                             axis=tuple(range(1, self.mean.ndim)))


def _filter(cls, dd):
    import dataclasses
    names = {f.name for f in dataclasses.fields(cls)} - {'double_z', 'dtype', 'parent', 'name'}
    return {k: v for k, v in dd.items() if k in names}


# torch checkpoint key rules shared by the taming first-stage autoencoders:
# ModuleList paths flattened to our per-level names + GroupNorm scale.
_AE_TORCH_KEY_RULES = (
    (r'\.(down|up)\.(\d+)\.(block|attn)\.(\d+)\.', r'.\1_\2_\3_\4.'),
    (r'\.down\.(\d+)\.downsample\.conv\.', r'.down_\1_downsample_conv.'),
    (r'\.up\.(\d+)\.upsample\.conv\.', r'.up_\1_upsample_conv.'),
    (r'\.mid\.(block_\d|attn_\d)\.', r'.mid_\1.'),
    (r'(norm\d?|norm_out)\.weight$', r'\1.scale'),
    (r'quantize\.embedding\.weight$', 'quantize.embedding'),
)


@ARCH_REGISTRY.register()
class VQModelTorch(nn.Module):
    TORCH_KEY_RULES = _AE_TORCH_KEY_RULES
    """VQ first stage (reference autoencoder_arch.py:16-63; name kept for
    config parity — this is the JAX implementation)."""
    ddconfig: dict
    n_embed: int
    embed_dim: int
    sane_index_shape: bool = False
    dtype: Any = None

    def setup(self):
        dd = dict(self.ddconfig)
        self.encoder = Encoder(dtype=self.dtype, **_filter(Encoder, dd), double_z=False)
        self.decoder = Decoder(dtype=self.dtype, **_filter(Decoder, dd))
        self.quantize = VectorQuantizer(self.n_embed, self.embed_dim, beta=0.25)
        self.quant_conv = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(dd['z_channels'], (1, 1), dtype=self.dtype)

    def encode(self, x):
        return self.quant_conv(self.encoder(x))

    def decode(self, h, force_not_quantize: bool = False):
        if not force_not_quantize:
            quant, _, _ = self.quantize(h)
        else:
            quant = h
        return self.decoder(self.post_quant_conv(quant))

    def __call__(self, x, force_not_quantize: bool = False):
        return self.decode(self.encode(x), force_not_quantize)


@ARCH_REGISTRY.register()
class AutoencoderKLTorch(nn.Module):
    TORCH_KEY_RULES = _AE_TORCH_KEY_RULES
    """KL first stage (reference autoencoder_arch.py:66-103)."""
    ddconfig: dict
    embed_dim: int
    dtype: Any = None

    def setup(self):
        dd = dict(self.ddconfig)
        assert dd.get('double_z', True)
        self.encoder = Encoder(dtype=self.dtype, **_filter(Encoder, dd), double_z=True)
        self.decoder = Decoder(dtype=self.dtype, **_filter(Decoder, dd))
        self.quant_conv = nn.Conv(2 * self.embed_dim, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(dd['z_channels'], (1, 1), dtype=self.dtype)

    def encode(self, x, sample_posterior: bool = False, key=None, return_moments: bool = False):
        moments = self.quant_conv(self.encoder(x))
        posterior = DiagonalGaussianDistribution(moments)
        z = posterior.sample(key) if sample_posterior else posterior.mode()
        return (z, moments) if return_moments else z

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, sample_posterior: bool = False, key=None):
        return self.decode(self.encode(x, sample_posterior, key))


@ARCH_REGISTRY.register()
class IdentityFirstStage(nn.Module):
    """(reference autoencoder_arch.py:131-146)"""
    vq_interface: bool = False

    def encode(self, x, *args, **kwargs):
        return x

    def decode(self, x, *args, **kwargs):
        return x

    def __call__(self, x, *args, **kwargs):
        return x
