"""Discriminators: VGG-style (BN) and Real-ESRGAN U-Net with spectral norm
(reference: basicsr/archs/discriminator_arch.py:9-150).

Spectral norm here is stateless: sigma is estimated by a fixed number of
power iterations from a deterministic start each forward (jit-friendly — no
running ``u`` buffer to thread through the functional state). torch keeps a
running single-iteration estimate; both converge to the true top singular
value, and ``weight_orig`` checkpoints convert directly.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils.registry import ARCH_REGISTRY
from .arch_util import resize_bilinear


def spectral_normalize(w: jnp.ndarray, n_iters: int = 0, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize an HWIO conv kernel (or 2D matrix) by its top singular value.

    Sigma is exact: the top eigenvalue of the (small-side) Gram matrix via
    ``eigvalsh`` — one matmul + a symmetric eigensolve, both XLA-native. This
    beats torch's running one-step power iteration (which needs many forward
    passes to converge when the spectrum is near-degenerate, e.g. 1x1
    shortcut convs) and is deterministic under jit. ``n_iters`` is kept for
    API compatibility and ignored."""
    mat = w.reshape(-1, w.shape[-1]) if w.ndim > 2 else w  # (in*k*k, out)
    n, o = mat.shape
    gram = mat.T @ mat if o <= n else mat @ mat.T
    sigma = jnp.sqrt(jnp.clip(jnp.linalg.eigvalsh(gram)[-1], 0.0, None))
    return w / (sigma + eps)


class SNConv(nn.Module):
    """Conv with spectral-normalized kernel."""
    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: Any = 'SAME'
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (kh, kw, x.shape[-1], self.features))
        kernel = spectral_normalize(kernel)
        out = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), self.strides, self.padding,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        if self.use_bias:
            bias = self.param('bias', nn.initializers.zeros, (self.features,))
            out = out + bias.astype(x.dtype)
        return out


@ARCH_REGISTRY.register()
class VGGStyleDiscriminator(nn.Module):
    """(reference discriminator_arch.py:9-90). Train mode updates BN
    batch_stats (pass ``mutable=['batch_stats']``)."""
    TORCH_KEY_RULES = ((r'(bn\d+_\d+)\.weight', r'\1.scale'),)

    num_in_ch: int = 3
    num_feat: int = 64
    input_size: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.input_size in (128, 256)
        assert x.shape[1] == self.input_size, (
            f'Input size must be {self.input_size}, got {x.shape}.')

        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name=name)

        def conv(name, feats, ksize, stride, use_bias=False):
            pad = ((1, 1), (1, 1))
            return nn.Conv(feats, (ksize, ksize), strides=(stride, stride), padding=pad,
                           use_bias=use_bias, dtype=self.dtype, name=name)

        lrelu = lambda v: nn.leaky_relu(v, negative_slope=0.2)  # noqa: E731

        feat = lrelu(conv('conv0_0', self.num_feat, 3, 1, use_bias=True)(x))
        feat = lrelu(bn('bn0_1')(conv('conv0_1', self.num_feat, 4, 2)(feat)))

        num_stages = 4 if self.input_size == 128 else 5
        for i in range(1, num_stages + 1):
            ch = self.num_feat * min(2**i, 8)
            feat = lrelu(bn(f'bn{i}_0')(conv(f'conv{i}_0', ch, 3, 1)(feat)))
            feat = lrelu(bn(f'bn{i}_1')(conv(f'conv{i}_1', ch, 4, 2)(feat)))

        # flatten in torch NCHW order so converted linear weights line up
        feat = feat.transpose(0, 3, 1, 2).reshape(feat.shape[0], -1)
        feat = lrelu(nn.Dense(100, dtype=self.dtype, name='linear1')(feat))
        return nn.Dense(1, dtype=self.dtype, name='linear2')(feat)


@ARCH_REGISTRY.register()
@ARCH_REGISTRY.register(name='UNetDiscriminatorSN_basicsr4rs_tpu')
class UNetDiscriminatorSN(nn.Module):
    """(reference discriminator_arch.py:91-150)"""
    num_in_ch: int = 3
    num_feat: int = 64
    skip_connection: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        lrelu = lambda v: nn.leaky_relu(v, negative_slope=0.2)  # noqa: E731
        pad1 = ((1, 1), (1, 1))

        x0 = lrelu(nn.Conv(self.num_feat, (3, 3), dtype=self.dtype, name='conv0')(x))
        x1 = lrelu(SNConv(self.num_feat * 2, (4, 4), (2, 2), pad1, use_bias=False,
                          dtype=self.dtype, name='conv1')(x0))
        x2 = lrelu(SNConv(self.num_feat * 4, (4, 4), (2, 2), pad1, use_bias=False,
                          dtype=self.dtype, name='conv2')(x1))
        x3 = lrelu(SNConv(self.num_feat * 8, (4, 4), (2, 2), pad1, use_bias=False,
                          dtype=self.dtype, name='conv3')(x2))

        n, h, w, _ = x3.shape
        x3 = resize_bilinear(x3, h * 2, w * 2)
        x4 = lrelu(SNConv(self.num_feat * 4, (3, 3), use_bias=False, dtype=self.dtype,
                          name='conv4')(x3))
        if self.skip_connection:
            x4 = x4 + x2
        n, h, w, _ = x4.shape
        x4 = resize_bilinear(x4, h * 2, w * 2)
        x5 = lrelu(SNConv(self.num_feat * 2, (3, 3), use_bias=False, dtype=self.dtype,
                          name='conv5')(x4))
        if self.skip_connection:
            x5 = x5 + x1
        n, h, w, _ = x5.shape
        x5 = resize_bilinear(x5, h * 2, w * 2)
        x6 = lrelu(SNConv(self.num_feat, (3, 3), use_bias=False, dtype=self.dtype,
                          name='conv6')(x5))
        if self.skip_connection:
            x6 = x6 + x0

        out = lrelu(SNConv(self.num_feat, (3, 3), use_bias=False, dtype=self.dtype, name='conv7')(x6))
        out = lrelu(SNConv(self.num_feat, (3, 3), use_bias=False, dtype=self.dtype, name='conv8')(out))
        return nn.Conv(1, (3, 3), dtype=self.dtype, name='conv9')(out)
