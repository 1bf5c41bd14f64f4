"""BasicVSR++ — second-order grid propagation + flow-guided deformable
alignment (reference: basicsr/archs/basicvsrpp_arch.py:15-417).

TPU notes: the reference's ``cpu_cache`` offloading and the data-dependent
mirror-extension check are host-side GPU-memory workarounds; here sequences
stay on device (rematerialization handles memory) and both flow directions
are always computed.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.dcn import modulated_deform_conv
from ..utils.registry import ARCH_REGISTRY
from .arch_util import flow_warp, pixel_shuffle, resize_bicubic, resize_bilinear
from .basicvsr_arch import ConvResidualBlocks
from .spynet_arch import SpyNet


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.1)


class SecondOrderDeformableAlignment(nn.Module):
    """Flow-guided second-order deformable alignment
    (reference basicvsrpp_arch.py:347-417)."""
    in_channels: int
    out_channels: int
    kernel_size: int = 3
    padding: int = 1
    deformable_groups: int = 16
    max_residue_magnitude: float = 10.
    dtype: Any = None

    @nn.compact
    def __call__(self, x, extra_feat, flow_1, flow_2):
        import math
        dg = self.deformable_groups
        k = self.kernel_size
        extra = jnp.concatenate([extra_feat, flow_1, flow_2], axis=-1)
        out = _lrelu(nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name='conv_offset_0')(extra))
        out = _lrelu(nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name='conv_offset_2')(out))
        out = _lrelu(nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name='conv_offset_4')(out))
        out = nn.Conv(27 * dg, (3, 3), kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros, dtype=self.dtype, name='conv_offset_6')(out)

        o1, o2, mask = jnp.split(out, 3, axis=-1)
        offset = self.max_residue_magnitude * jnp.tanh(jnp.concatenate((o1, o2), axis=-1))
        offset_1, offset_2 = jnp.split(offset, 2, axis=-1)
        # add the flows, (dy, dx) interleaved per tap (reference :404-407)
        n_rep = offset_1.shape[-1] // 2
        flow1_yx = jnp.tile(flow_1[..., ::-1], (1, 1, 1, n_rep))
        flow2_yx = jnp.tile(flow_2[..., ::-1], (1, 1, 1, n_rep))
        offset_1 = offset_1 + flow1_yx
        offset_2 = offset_2 + flow2_yx
        offset = jnp.concatenate([offset_1, offset_2], axis=-1)
        mask = jax.nn.sigmoid(mask)

        fan_in = self.in_channels * k * k
        stdv = 1. / math.sqrt(fan_in)
        weight = self.param('kernel',
                            lambda rng, shape: jax.random.uniform(rng, shape, jnp.float32, -stdv, stdv),
                            (k, k, self.in_channels, self.out_channels))
        bias = self.param('bias', nn.initializers.zeros, (self.out_channels,))
        return modulated_deform_conv(x, offset, mask, weight, bias, stride=1,
                                     padding=self.padding, deform_groups=dg)


@ARCH_REGISTRY.register()
class BasicVSRPlusPlus(nn.Module):
    """(reference basicvsrpp_arch.py:15-345)"""
    # ModuleDict branch keys: deform_align.backward_1 -> deform_align_backward_1
    TORCH_KEY_RULES = ((r'\.(backward_\d|forward_\d)\.', r'_\1.'),)

    mid_channels: int = 64
    num_blocks: int = 7
    max_residue_magnitude: float = 10.
    is_low_res_input: bool = True
    spynet_path: Optional[str] = None
    cpu_cache_length: int = 100  # unused on TPU; kept for config parity
    dtype: Any = None

    @nn.compact
    def __call__(self, lqs):
        n, t, h, w, c = lqs.shape
        mc = self.mid_channels

        if self.is_low_res_input:
            lqs_downsample = lqs
        else:
            flat = lqs.reshape(-1, h, w, c)
            lqs_downsample = resize_bicubic(flat, 0.25).reshape(n, t, h // 4, w // 4, c)

        # spatial features per frame
        if self.is_low_res_input:
            feat_extract = ConvResidualBlocks(mc, 5, dtype=self.dtype, name='feat_extract')
            feats_spatial = feat_extract(lqs.reshape(-1, h, w, c))
            fh, fw = h, w
        else:
            x0 = _lrelu(nn.Conv(mc, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                                dtype=self.dtype, name='feat_extract_0')(lqs.reshape(-1, h, w, c)))
            x0 = _lrelu(nn.Conv(mc, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                                dtype=self.dtype, name='feat_extract_2')(x0))
            feats_spatial = ConvResidualBlocks(mc, 5, dtype=self.dtype, name='feat_extract_4')(x0)
            fh, fw = h // 4, w // 4
        feats: Dict[str, List] = {'spatial': [feats_spatial.reshape(n, t, fh, fw, mc)[:, i]
                                              for i in range(t)]}

        # flows on the downsampled sequence
        dh, dw = lqs_downsample.shape[2], lqs_downsample.shape[3]
        assert dh >= 64 and dw >= 64, (
            f'The height and width of low-res inputs must be at least 64, but got {dh} and {dw}.')
        spynet = SpyNet(dtype=self.dtype, name='spynet')
        l1 = lqs_downsample[:, :-1].reshape(-1, dh, dw, c)
        l2 = lqs_downsample[:, 1:].reshape(-1, dh, dw, c)
        flows_backward = spynet(l1, l2).reshape(n, t - 1, dh, dw, 2)
        flows_forward = spynet(l2, l1).reshape(n, t - 1, dh, dw, 2)

        # second-order propagation through 4 branches (reference :159-235)
        for iter_ in [1, 2]:
            for direction in ['backward', 'forward']:
                module = f'{direction}_{iter_}'
                feats[module] = []
                flows = flows_backward if direction == 'backward' else flows_forward

                deform_align = SecondOrderDeformableAlignment(
                    2 * mc, mc, 3, padding=1, deformable_groups=16,
                    max_residue_magnitude=self.max_residue_magnitude,
                    dtype=self.dtype, name=f'deform_align_{module}')
                n_in = (2 + (0 if module == 'backward_1' else
                             1 if module == 'forward_1' else
                             2 if module == 'backward_2' else 3)) * mc
                backbone = ConvResidualBlocks(mc, self.num_blocks, dtype=self.dtype,
                                              name=f'backbone_{module}')
                del n_in  # input width is implied by the concat below

                frame_idx = list(range(t))
                flow_idx = list(range(-1, t - 1))
                if direction == 'backward':
                    frame_idx = frame_idx[::-1]
                    flow_idx = frame_idx

                feat_prop = jnp.zeros((n, fh, fw, mc), lqs.dtype)
                for i, idx in enumerate(frame_idx):
                    feat_current = feats['spatial'][idx]
                    if i > 0:
                        flow_n1 = flows[:, flow_idx[i]]
                        cond_n1 = flow_warp(feat_prop, flow_n1)
                        feat_n2 = jnp.zeros_like(feat_prop)
                        flow_n2 = jnp.zeros_like(flow_n1)
                        cond_n2 = jnp.zeros_like(cond_n1)
                        if i > 1:
                            feat_n2 = feats[module][-2]
                            flow_n2 = flows[:, flow_idx[i - 1]]
                            flow_n2 = flow_n1 + flow_warp(flow_n2, flow_n1)
                            cond_n2 = flow_warp(feat_n2, flow_n2)
                        cond = jnp.concatenate([cond_n1, feat_current, cond_n2], axis=-1)
                        feat_prop = jnp.concatenate([feat_prop, feat_n2], axis=-1)
                        feat_prop = deform_align(feat_prop, cond, flow_n1, flow_n2)

                    feat = ([feat_current] +
                            [feats[k][idx] for k in feats if k not in ('spatial', module)] +
                            [feat_prop])
                    feat_prop = feat_prop + backbone(jnp.concatenate(feat, axis=-1))
                    feats[module].append(feat_prop)

                if direction == 'backward':
                    feats[module] = feats[module][::-1]

        # upsampling (reference :237-280)
        reconstruction = ConvResidualBlocks(mc, 5, dtype=self.dtype, name='reconstruction')
        upconv1 = nn.Conv(mc * 4, (3, 3), dtype=self.dtype, name='upconv1')
        upconv2 = nn.Conv(64 * 4, (3, 3), dtype=self.dtype, name='upconv2')
        conv_hr = nn.Conv(64, (3, 3), dtype=self.dtype, name='conv_hr')
        conv_last = nn.Conv(3, (3, 3), dtype=self.dtype, name='conv_last')

        hr_all = jnp.stack(
            [jnp.concatenate([feats['spatial'][i]] +
                             [feats[k][i] for k in feats if k != 'spatial'], axis=-1)
             for i in range(t)], axis=1).reshape(n * t, fh, fw, 5 * mc)
        hr = reconstruction(hr_all)
        hr = _lrelu(pixel_shuffle(upconv1(hr), 2))
        hr = _lrelu(pixel_shuffle(upconv2(hr), 2))
        hr = _lrelu(conv_hr(hr))
        hr = conv_last(hr)
        if self.is_low_res_input:
            base = resize_bilinear(lqs.reshape(n * t, h, w, c), h * 4, w * 4)
            out_h, out_w = h * 4, w * 4
        else:
            base = lqs.reshape(n * t, h, w, c)
            out_h, out_w = h, w
        return (hr + base).reshape(n, t, out_h, out_w, 3)
