"""Align autoencoder archs for misregistered L2S pairs
(reference: basicsr/archs/alignae_arch.py:6-53)."""

from __future__ import annotations

from typing import Any

from flax import linen as nn

from ..utils.registry import ARCH_REGISTRY
from .arch_util import CAB


class AlignNet(nn.Module):
    """conv -> CAB x num_block -> 1x1 conv (with the reference's quirky
    padding=1 on the 1x1, reproduced for shape parity)."""
    num_in_ch: int
    num_out_ch: int
    num_feat: int = 64
    num_block: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.num_feat, (3, 3), dtype=self.dtype, name='conv_first')(x)
        for i in range(self.num_block):
            x = CAB(self.num_feat, dtype=self.dtype, name=f'body_{i}')(x)
        # reference uses nn.Conv2d(..., 1, 1, 1): kernel 1, padding 1 (quirk)
        return nn.Conv(self.num_out_ch, (1, 1), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name='conv_last')(x)


@ARCH_REGISTRY.register()
class LREncoder(nn.Module):
    """(reference alignae_arch.py:29-36)"""
    num_in_ch: int
    num_out_ch: int
    num_feat: int = 64
    num_block: int = 8
    dtype: Any = None

    def setup(self):
        self.lr_encoder = AlignNet(self.num_in_ch, self.num_out_ch, self.num_feat,
                                   self.num_block, dtype=self.dtype)

    def encode(self, x):
        return self.lr_encoder(x)

    def __call__(self, x):
        return self.encode(x)


@ARCH_REGISTRY.register()
class AlignAutoencoder(nn.Module):
    """(reference alignae_arch.py:38-53)"""
    num_in_ch: int
    num_out_ch: int
    num_feat: int = 64
    num_block: int = 8
    dtype: Any = None

    def setup(self):
        self.align_encoder = AlignNet(self.num_in_ch, self.num_out_ch, self.num_feat,
                                      self.num_block, dtype=self.dtype)
        self.decoder = AlignNet(self.num_out_ch, self.num_out_ch, self.num_feat,
                                self.num_block, dtype=self.dtype)

    def encode(self, x):
        return self.align_encoder(x)

    def decode(self, x):
        return self.decoder(x)

    def __call__(self, x):
        stage1 = self.encode(x)
        stage2 = self.decode(stage1)
        return {'stage1': stage1, 'stage2': stage2}


# Several shipped configs (options/train/AlignAutoencoder/*,
# train_SwinIR_StyleCNN_*) use the pre-rename class name ``StyleResNet`` for
# this conv-CAB autoencoder; the class itself is absent from the reference
# tree, so the alias preserves those configs' intent.
ARCH_REGISTRY.register(AlignAutoencoder, 'StyleResNet')
