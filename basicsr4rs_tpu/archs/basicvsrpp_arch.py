"""BasicVSR++ — second-order grid propagation + flow-guided deformable
alignment (reference: basicsr/archs/basicvsrpp_arch.py:15-417).

TPU notes: the reference's ``cpu_cache`` offloading and the data-dependent
mirror-extension check are host-side GPU-memory workarounds; here sequences
stay on device (rematerialization handles memory) and both flow directions
are always computed.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

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


class _PPPropStep(nn.Module):
    """One second-order propagation step (reference basicvsrpp_arch.py:186-235),
    lifted under ``nn.scan`` so compile time is independent of T.

    The reference's data-dependent step structure (i==0 skips alignment,
    i==1 has no second-order neighbour) is made scan-uniform with two
    broadcast masks: ``m1`` zeroes the aligned features on the first step
    (alignment output unused, exactly like the reference's skipped call) and
    ``m2`` zeroes the second-order inputs on the first two steps (the
    reference feeds explicit zeros there)."""
    mid_channels: int
    num_blocks: int
    max_residue_magnitude: float
    dtype: Any = None

    @nn.compact
    def __call__(self, carry, xs):
        prop1, prop2 = carry  # feat_prop at i-1, i-2
        feat_current, prevs, flow_n1, flow_prev, m1, m2 = xs
        cond_n1 = flow_warp(prop1, flow_n1)
        feat_n2 = prop2 * m2
        flow_n2 = (flow_n1 + flow_warp(flow_prev, flow_n1)) * m2
        cond_n2 = flow_warp(feat_n2, flow_n2) * m2
        cond = jnp.concatenate([cond_n1, feat_current, cond_n2], axis=-1)
        fp_in = jnp.concatenate([prop1, feat_n2], axis=-1)
        aligned = SecondOrderDeformableAlignment(
            2 * self.mid_channels, self.mid_channels, 3, padding=1,
            deformable_groups=16, max_residue_magnitude=self.max_residue_magnitude,
            dtype=self.dtype, name='deform_align')(fp_in, cond, flow_n1, flow_n2)
        feat_prop = aligned * m1
        feat = jnp.concatenate([feat_current, prevs, feat_prop], axis=-1)
        new_prop = feat_prop + ConvResidualBlocks(self.mid_channels, self.num_blocks,
                                                  dtype=self.dtype, name='backbone')(feat)
        new_prop = new_prop.astype(prop1.dtype)
        return (new_prop, prop1), new_prop


@ARCH_REGISTRY.register()
class BasicVSRPlusPlus(nn.Module):
    """(reference basicvsrpp_arch.py:15-345)"""
    # ModuleDict branch keys: deform_align.backward_1 / backbone.backward_1
    # live inside the scanned step module: prop_backward_1.{deform_align,backbone}
    TORCH_KEY_RULES = ((r'(deform_align|backbone)\.(backward_\d|forward_\d)\.',
                        r'prop_\2.\1.'),)

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
        feats: Dict[str, Any] = {}  # per-branch (n, t, fh, fw, mc), frame order

        # flows on the downsampled sequence
        dh, dw = lqs_downsample.shape[2], lqs_downsample.shape[3]
        assert dh >= 64 and dw >= 64, (
            f'The height and width of low-res inputs must be at least 64, but got {dh} and {dw}.')
        spynet = SpyNet(dtype=self.dtype, name='spynet')
        l1 = lqs_downsample[:, :-1].reshape(-1, dh, dw, c)
        l2 = lqs_downsample[:, 1:].reshape(-1, dh, dw, c)
        # both flow directions in ONE SpyNet body (2x batch)
        flows = spynet(jnp.concatenate([l1, l2], axis=0),
                       jnp.concatenate([l2, l1], axis=0))
        flows_backward, flows_forward = (f.reshape(n, t - 1, dh, dw, 2)
                                         for f in jnp.split(flows, 2, axis=0))

        # second-order propagation through 4 branches (reference :159-235),
        # each branch one lifted nn.scan over iteration order
        feats_spatial_arr = feats_spatial.reshape(n, t, fh, fw, mc)
        order = ['backward_1', 'forward_1', 'backward_2', 'forward_2']
        for module in order:
            direction = module.split('_')[0]
            flows = flows_backward if direction == 'backward' else flows_forward

            frame_idx = list(range(t))
            flow_idx = list(range(-1, t - 1))
            if direction == 'backward':
                frame_idx = frame_idx[::-1]
                flow_idx = frame_idx

            # gather per-step inputs into iteration order (static indices)
            fi = jnp.asarray(frame_idx)
            feat_cur = feats_spatial_arr[:, fi]
            prev_keys = order[:order.index(module)]
            if prev_keys:
                prevs = jnp.concatenate([feats[k][:, fi] for k in prev_keys], axis=-1)
            else:
                prevs = jnp.zeros((n, t, fh, fw, 0), lqs.dtype)
            if t > 1:
                clamp = lambda v: min(max(v, 0), t - 2)  # noqa: E731
                n1_idx = jnp.asarray([clamp(flow_idx[i]) for i in range(t)])
                pv_idx = jnp.asarray([clamp(flow_idx[i - 1]) if i >= 1 else 0
                                      for i in range(t)])
                flow_n1 = flows[:, n1_idx]
                flow_prev = flows[:, pv_idx]
            else:  # no flows exist; alignment is fully masked at i == 0
                flow_n1 = flow_prev = jnp.zeros((n, 1, dh, dw, 2), lqs.dtype)
            # (1, t, 1, 1, 1): per-step slices broadcast against (n,h,w,c)
            steps = jnp.arange(t).reshape(1, t, 1, 1, 1)
            m1 = (steps >= 1).astype(lqs.dtype)
            m2 = (steps >= 2).astype(lqs.dtype)

            init = jnp.zeros((n, fh, fw, mc), lqs.dtype)
            Scan = nn.scan(_PPPropStep, variable_broadcast='params',
                           split_rngs={'params': False}, in_axes=1, out_axes=1)
            _, ys = Scan(mc, self.num_blocks, self.max_residue_magnitude,
                         dtype=self.dtype, name=f'prop_{module}')(
                             (init, init),
                             (feat_cur, prevs, flow_n1, flow_prev, m1, m2))
            if direction == 'backward':
                ys = ys[:, ::-1]  # back to frame order
            feats[module] = ys

        # upsampling (reference :237-280)
        reconstruction = ConvResidualBlocks(mc, 5, dtype=self.dtype, name='reconstruction')
        upconv1 = nn.Conv(mc * 4, (3, 3), dtype=self.dtype, name='upconv1')
        upconv2 = nn.Conv(64 * 4, (3, 3), dtype=self.dtype, name='upconv2')
        conv_hr = nn.Conv(64, (3, 3), dtype=self.dtype, name='conv_hr')
        conv_last = nn.Conv(3, (3, 3), dtype=self.dtype, name='conv_last')

        hr_all = jnp.concatenate(
            [feats_spatial_arr] + [feats[k] for k in order],
            axis=-1).reshape(n * t, fh, fw, 5 * mc)
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
