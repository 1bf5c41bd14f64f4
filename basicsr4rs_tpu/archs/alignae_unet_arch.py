"""Composite align-AE + LR-encoder + Swin UNet
(reference: basicsr/archs/alignae_unet_arch.py:6-42)."""

from __future__ import annotations

from typing import Any

from flax import linen as nn

from ..utils.registry import ARCH_REGISTRY
from .alignae_arch import AlignAutoencoder, LREncoder
from .unet_arch import UNetModelSwin


@ARCH_REGISTRY.register()
class ResNetAE_SwinUNet(nn.Module):
    """Holds the three sub-networks with ``net_lr/net_ae/net_u`` accessors;
    the owning model orchestrates them (forward is intentionally indirect,
    like the reference)."""
    unet_args: dict
    align_autoencoder_args: dict
    lr_encoder_args: dict
    dtype: Any = None

    def setup(self):
        self.unet = UNetModelSwin(dtype=self.dtype, **self.unet_args)
        self.align_autoencoder = AlignAutoencoder(dtype=self.dtype,
                                                  **self.align_autoencoder_args)
        self.lr_encoder = LREncoder(dtype=self.dtype, **self.lr_encoder_args)

    # accessors (reference :25-33): call as
    # net.apply(vars, x, t, lq, method=ResNetAE_SwinUNet.apply_unet) etc.
    def apply_unet(self, x, t, lq=None):
        return self.unet(x, t, lq=lq)

    def apply_ae_encode(self, x):
        return self.align_autoencoder.encode(x)

    def apply_ae_decode(self, x):
        return self.align_autoencoder.decode(x)

    def apply_lr_encode(self, x):
        return self.lr_encoder.encode(x)

    def __call__(self, x, t, lq=None):
        # initialize all submodule params in one pass; the AE consumes the
        # registration input (lq_up ‖ gt), i.e. double the band count of x
        z = self.lr_encoder.encode(lq) if lq is not None else None
        import jax.numpy as jnp
        s1 = self.align_autoencoder.encode(jnp.concatenate([x, x], axis=-1))
        _ = self.align_autoencoder.decode(s1)
        return self.unet(x, t, lq=lq)
