"""TOFlow — task-oriented flow video SR
(reference: basicsr/archs/tof_arch.py:9-175). Frames pre-upsampled to GT size."""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..utils.registry import ARCH_REGISTRY
from .arch_util import flow_warp, resize_bilinear


class BasicModuleTOF(nn.Module):
    """SpyNet basic module with BN (reference tof_arch.py:9-39).
    Torch Sequential: convs at 0,3,6,9,12; BN at 1,4,7,10."""
    eps: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        chans = (32, 64, 32, 16)
        for i, ch in zip((0, 3, 6, 9), chans):
            x = nn.Conv(ch, (7, 7), use_bias=False, dtype=self.dtype, name=f'basic_module_{i}')(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=self.eps,
                             name=f'basic_module_{i + 1}')(x)
            x = nn.relu(x)
        return nn.Conv(2, (7, 7), dtype=self.dtype, name='basic_module_12')(x)


class SPyNetTOF(nn.Module):
    """4-level SpyNet for TOF (reference tof_arch.py:42-92)."""
    dtype: Any = None

    @nn.compact
    def __call__(self, ref, supp, train: bool = False):
        n, h, w, _ = ref.shape
        refs, supps = [ref], [supp]
        for _ in range(3):
            refs.insert(0, nn.avg_pool(refs[0], (2, 2), strides=(2, 2)))
            supps.insert(0, nn.avg_pool(supps[0], (2, 2), strides=(2, 2)))

        flow = jnp.zeros((n, h // 16, w // 16, 2), ref.dtype)
        for i in range(4):
            flow_up = resize_bilinear(flow, flow.shape[1] * 2, flow.shape[2] * 2,
                                      align_corners=True) * 2.0
            warped = flow_warp(supps[i], flow_up)
            inp = jnp.concatenate([refs[i], warped, flow_up], axis=-1)
            flow = flow_up + BasicModuleTOF(dtype=self.dtype, name=f'basic_module_{i}')(inp, train)
        return flow


@ARCH_REGISTRY.register()
class TOFlow(nn.Module):
    """(reference tof_arch.py:94-175). Input (B, 7, H, W, 3) pre-upsampled."""
    # BatchNorm positions in the BasicModule Sequential -> flax 'scale'
    TORCH_KEY_RULES = (
        (r'basic_module\.(1|4|7|10)\.weight', r'basic_module.\1.scale'),
    )

    adapt_official_weights: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, lrs, train: bool = False):
        ref_idx = 0 if self.adapt_official_weights else 3
        if self.adapt_official_weights:
            lrs = lrs[:, jnp.array([3, 0, 1, 2, 4, 5, 6])]

        b, t, h, w, c = lrs.shape
        mean = jnp.asarray([0.485, 0.456, 0.406], lrs.dtype)
        std = jnp.asarray([0.229, 0.224, 0.225], lrs.dtype)
        lrs = (lrs - mean) / std

        spynet = SPyNetTOF(dtype=self.dtype, name='spynet')
        lr_ref = lrs[:, ref_idx]
        if train:
            # SpyNetTOF contains BatchNorm: under training, batch statistics
            # (and running-stat updates) must come from the reference's
            # per-support-frame batches — keep the per-frame calls.
            aligned = []
            for i in range(t):
                if i == ref_idx:
                    aligned.append(lr_ref)
                else:
                    lr_supp = lrs[:, i]
                    flow = spynet(lr_ref, lr_supp, train)
                    aligned.append(flow_warp(lr_supp, flow))
            hr = jnp.stack(aligned, axis=1)
        else:
            # eval (running-average BN is per-sample): fold the t-1 support
            # frames into the batch axis — ONE flow body instead of t-1
            # (reference loops per frame, tof_arch.py:79-90)
            supp_idx = [i for i in range(t) if i != ref_idx]
            supp = lrs[:, jnp.asarray(supp_idx)].transpose(1, 0, 2, 3, 4)
            supp = supp.reshape((t - 1) * b, h, w, c)
            flow = spynet(jnp.tile(lr_ref, (t - 1, 1, 1, 1)), supp, train)
            warped = flow_warp(supp, flow).reshape(t - 1, b, h, w, c)
            aligned, j = [], 0
            for i in range(t):
                if i == ref_idx:
                    aligned.append(lr_ref)
                else:
                    aligned.append(warped[j])
                    j += 1
            hr = jnp.stack(aligned, axis=1)
        # torch flattens (t, c) channel-major — keep that order for conversion
        hr = hr.transpose(0, 2, 3, 1, 4).reshape(b, h, w, t * c)
        hr = nn.relu(nn.Conv(64, (9, 9), dtype=self.dtype, name='conv_1')(hr))
        hr = nn.relu(nn.Conv(64, (9, 9), dtype=self.dtype, name='conv_2')(hr))
        hr = nn.relu(nn.Conv(64, (1, 1), dtype=self.dtype, name='conv_3')(hr))
        hr = nn.Conv(3, (1, 1), dtype=self.dtype, name='conv_4')(hr) + lr_ref
        return hr * std + mean
