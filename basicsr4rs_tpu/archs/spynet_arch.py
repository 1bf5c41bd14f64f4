"""SpyNet optical flow — 6-level coarse-to-fine pyramid
(reference: basicsr/archs/spynet_arch.py:10-110)."""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils.registry import ARCH_REGISTRY
from .arch_util import flow_warp, resize_bilinear


class BasicModule(nn.Module):
    """5-layer 7x7 conv stack 8->32->64->32->16->2 (reference :10-25).
    Torch names basic_module.{0,2,4,6,8}."""
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        for i, ch in zip((0, 2, 4, 6), (32, 64, 32, 16)):
            x = nn.relu(nn.Conv(ch, (7, 7), dtype=self.dtype, name=f'basic_module_{i}')(x))
        return nn.Conv(2, (7, 7), dtype=self.dtype, name='basic_module_8')(x)


@ARCH_REGISTRY.register()
class SpyNet(nn.Module):
    """(reference :29-110). NHWC; flow channels (dx, dy) like flow_warp expects.

    Note: torch flow tensors are (B, 2, H, W) with channel 0 = dx; here flow
    is (B, H, W, 2) with the same (dx, dy) order.
    """
    load_path: Optional[str] = None  # handled by the owning model's loader
    dtype: Any = None

    def _preprocess(self, x):
        mean = jnp.asarray([0.485, 0.456, 0.406], x.dtype)
        std = jnp.asarray([0.229, 0.224, 0.225], x.dtype)
        return (x - mean) / std

    @nn.compact
    def __call__(self, ref, supp):
        assert ref.shape == supp.shape
        n, h, w, c = ref.shape
        w_floor = math.floor(math.ceil(w / 32.0) * 32.0)
        h_floor = math.floor(math.ceil(h / 32.0) * 32.0)

        ref_r = resize_bilinear(ref, h_floor, w_floor)
        supp_r = resize_bilinear(supp, h_floor, w_floor)

        # 6-level pyramid via 2x2 average pooling (reference :50-57)
        refs = [self._preprocess(ref_r)]
        supps = [self._preprocess(supp_r)]
        for _ in range(5):
            refs.insert(0, nn.avg_pool(refs[0], (2, 2), strides=(2, 2)))
            supps.insert(0, nn.avg_pool(supps[0], (2, 2), strides=(2, 2)))

        flow = jnp.zeros((n, refs[0].shape[1] // 2, refs[0].shape[2] // 2, 2), ref.dtype)
        for level in range(6):
            up_h, up_w = refs[level].shape[1], refs[level].shape[2]
            upsampled_flow = resize_bilinear(flow, flow.shape[1] * 2, flow.shape[2] * 2,
                                             align_corners=True) * 2.0
            if upsampled_flow.shape[1] != up_h:
                upsampled_flow = jnp.pad(upsampled_flow, ((0, 0), (0, 1), (0, 0), (0, 0)), mode='edge')
            if upsampled_flow.shape[2] != up_w:
                upsampled_flow = jnp.pad(upsampled_flow, ((0, 0), (0, 0), (0, 1), (0, 0)), mode='edge')
            warped = flow_warp(supps[level], upsampled_flow, padding_mode='border')
            inp = jnp.concatenate([refs[level], warped, upsampled_flow], axis=-1)
            flow = BasicModule(dtype=self.dtype, name=f'basic_module_{level}')(inp) + upsampled_flow

        flow = resize_bilinear(flow, h, w)
        scale = jnp.asarray([w / w_floor, h / h_floor], flow.dtype)
        return flow * scale
