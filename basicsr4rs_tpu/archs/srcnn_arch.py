"""SRCNN — the 3-layer classic, configurable variant kept by the RS fork
(reference: basicsr/archs/srcnn_arch.py:8-24). Input is bicubic-upscaled
(torch a=-0.75, align_corners=True) before the convs."""

from __future__ import annotations

from typing import Any

from flax import linen as nn

from ..utils.registry import ARCH_REGISTRY
from .arch_util import resize_bicubic


@ARCH_REGISTRY.register()
class SRCNN(nn.Module):
    num_in_ch: int = 3
    num_out_ch: int = 3
    upscale: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = resize_bicubic(x, self.upscale, align_corners=True)
        x = nn.relu(nn.Conv(64, (9, 9), dtype=self.dtype, name='conv1')(x))
        x = nn.relu(nn.Conv(32, (5, 5), dtype=self.dtype, name='conv2')(x))
        return nn.Conv(self.num_out_ch, (5, 5), dtype=self.dtype, name='conv3')(x)
