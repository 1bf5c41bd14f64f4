"""BasicVSR / IconVSR — recurrent bidirectional video SR
(reference: basicsr/archs/basicvsr_arch.py:12-336). NHWC, frames (B,T,H,W,C).

TPU-native notes: all temporal recurrences (BasicVSR's trunks AND IconVSR's
keyframe-refill propagation) are lifted ``nn.scan``s — compile time
independent of T, params broadcast across steps. IconVSR's sparse keyframe
refills are scan-uniform: the fusion conv runs every step and a per-step
mask selects it only at keyframes; keyframe EDVR features are extracted in
ONE batched call (b*K) and ride the scan as a constant carry, dynamically
indexed per step. Per-frame reconstruction heads run batched over (B*T)
frames — bigger matmuls for the MXU than the reference's per-frame loops.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils.registry import ARCH_REGISTRY
from .arch_util import ResidualBlockNoBN, flow_warp, pixel_shuffle, resize_bilinear
from .edvr_arch import PCDAlignment, TSAFusion
from .spynet_arch import SpyNet


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.1)


def _conv_residual_blocks(scope_module, x, num_out_ch: int, num_block: int, dtype=None):
    """conv + lrelu + resblocks with torch-parity names main_0 / main_2_{i}
    (reference ConvResidualBlocks, basicvsr_arch.py:101-118). Creates layers
    in the *caller's* scope."""
    x = _lrelu(nn.Conv(num_out_ch, (3, 3), dtype=dtype, name='main_0')(x))
    for i in range(num_block):
        x = ResidualBlockNoBN(num_out_ch, dtype=dtype, name=f'main_2_{i}')(x)
    return x


class ConvResidualBlocks(nn.Module):
    """(reference basicvsr_arch.py:101-118)"""
    num_out_ch: int = 64
    num_block: int = 15
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        return _conv_residual_blocks(self, x, self.num_out_ch, self.num_block, self.dtype)


class _PropStep(nn.Module):
    """One recurrence step: warp carried features by flow, concat the frame,
    run the trunk. Used under nn.scan with params broadcast."""
    num_out_ch: int
    num_block: int
    dtype: Any = None

    @nn.compact
    def __call__(self, feat_prop, xs):
        x_i, flow = xs
        feat_prop = flow_warp(feat_prop, flow)
        feat_prop = _conv_residual_blocks(self, jnp.concatenate([x_i, feat_prop], axis=-1),
                                          self.num_out_ch, self.num_block, self.dtype)
        return feat_prop, feat_prop


def _scan_trunk(name, num_feat, num_block, init, xs, reverse=False, dtype=None):
    Scan = nn.scan(_PropStep, variable_broadcast='params', split_rngs={'params': False},
                   in_axes=1, out_axes=1, reverse=reverse)
    _, feats = Scan(num_feat, num_block, dtype=dtype, name=name)(init, xs)
    return feats


@ARCH_REGISTRY.register()
class BasicVSR(nn.Module):
    """(reference basicvsr_arch.py:12-98). x4 only."""
    num_feat: int = 64
    num_block: int = 15
    spynet_path: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        spynet = SpyNet(dtype=self.dtype, name='spynet')
        x1 = x[:, :-1].reshape(-1, h, w, c)
        x2 = x[:, 1:].reshape(-1, h, w, c)
        # both flow directions in ONE SpyNet body (2x batch)
        flows = spynet(jnp.concatenate([x1, x2], axis=0),
                       jnp.concatenate([x2, x1], axis=0))
        flows_backward, flows_forward = (f.reshape(b, t - 1, h, w, 2)
                                         for f in jnp.split(flows, 2, axis=0))

        zero_flow = jnp.zeros((b, 1, h, w, 2), x.dtype)
        init = jnp.zeros((b, h, w, self.num_feat), x.dtype)

        # backward branch: scan frames in reverse; first (=last) step gets a
        # dummy flow — warping the zero init is a no-op either way.
        flows_b = jnp.concatenate([flows_backward, zero_flow], axis=1)
        feats_b = _scan_trunk('backward_trunk', self.num_feat, self.num_block, init,
                              (x, flows_b), reverse=True, dtype=self.dtype)

        flows_f = jnp.concatenate([zero_flow, flows_forward], axis=1)
        feats_f = _scan_trunk('forward_trunk', self.num_feat, self.num_block, init,
                              (x, flows_f), reverse=False, dtype=self.dtype)

        # reconstruction head, batched over all frames
        out = jnp.concatenate([feats_b, feats_f], axis=-1).reshape(b * t, h, w, -1)
        out = _lrelu(nn.Conv(self.num_feat, (1, 1), dtype=self.dtype, name='fusion')(out))
        out = _lrelu(pixel_shuffle(nn.Conv(self.num_feat * 4, (3, 3), dtype=self.dtype,
                                           name='upconv1')(out), 2))
        out = _lrelu(pixel_shuffle(nn.Conv(64 * 4, (3, 3), dtype=self.dtype,
                                           name='upconv2')(out), 2))
        out = _lrelu(nn.Conv(64, (3, 3), dtype=self.dtype, name='conv_hr')(out))
        out = nn.Conv(3, (3, 3), dtype=self.dtype, name='conv_last')(out)
        base = resize_bilinear(x.reshape(b * t, h, w, c), h * 4, w * 4)
        return (out + base).reshape(b, t, h * 4, w * 4, 3)


class EDVRFeatureExtractor(nn.Module):
    """(reference basicvsr_arch.py:271-336)"""
    num_input_frame: int
    num_feat: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        b, n, h, w, c = x.shape
        center = self.num_input_frame // 2
        flat = x.reshape(-1, h, w, c)
        feat_l1 = _lrelu(nn.Conv(self.num_feat, (3, 3), dtype=self.dtype, name='conv_first')(flat))
        for i in range(5):
            feat_l1 = ResidualBlockNoBN(self.num_feat, dtype=self.dtype,
                                        name=f'feature_extraction_{i}')(feat_l1)
        feat_l2 = _lrelu(nn.Conv(self.num_feat, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                                 dtype=self.dtype, name='conv_l2_1')(feat_l1))
        feat_l2 = _lrelu(nn.Conv(self.num_feat, (3, 3), dtype=self.dtype, name='conv_l2_2')(feat_l2))
        feat_l3 = _lrelu(nn.Conv(self.num_feat, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                                 dtype=self.dtype, name='conv_l3_1')(feat_l2))
        feat_l3 = _lrelu(nn.Conv(self.num_feat, (3, 3), dtype=self.dtype, name='conv_l3_2')(feat_l3))

        feat_l1 = feat_l1.reshape(b, n, h, w, -1)
        feat_l2 = feat_l2.reshape(b, n, h // 2, w // 2, -1)
        feat_l3 = feat_l3.reshape(b, n, h // 4, w // 4, -1)

        # frames folded into the batch axis: one PCD body at batch b*n
        # instead of n unrolled bodies (see edvr_arch.EDVR.__call__)
        pcd = PCDAlignment(self.num_feat, 8, dtype=self.dtype, name='pcd_align')
        nbr_l = [feat_l1.reshape(b * n, h, w, -1),
                 feat_l2.reshape(b * n, h // 2, w // 2, -1),
                 feat_l3.reshape(b * n, h // 4, w // 4, -1)]
        ref_l = [jnp.repeat(feats[:, center:center + 1], n, axis=1)
                 .reshape(b * n, *feats.shape[2:])
                 for feats in (feat_l1, feat_l2, feat_l3)]
        aligned_feat = pcd(nbr_l, ref_l).reshape(b, n, h, w, -1)
        return TSAFusion(self.num_feat, self.num_input_frame, center, dtype=self.dtype,
                         name='fusion')(aligned_feat)


class _IconPropStep(nn.Module):
    """IconVSR recurrence step under ``nn.scan``: warp, keyframe-feature
    refill (masked select — keyframes are sparse but the fusion conv is
    cheap), trunk. Keyframe features ride along as a constant (K,b,h,w,c)
    carry and are dynamically indexed per step, so memory stays K-sized
    on long eval clips."""
    num_feat: int
    num_block: int
    with_extra: bool  # forward branch also concats the backward feature
    dtype: Any = None

    @nn.compact
    def __call__(self, carry, xs):
        feat_prop, kf_feats = carry
        if self.with_extra:
            x_i, extra, flow, kf_idx, is_kf = xs
        else:
            x_i, flow, kf_idx, is_kf = xs
            extra = None
        feat_prop = flow_warp(feat_prop, flow)
        kf_feat = jax.lax.dynamic_index_in_dim(kf_feats, kf_idx[0], axis=0,
                                               keepdims=False)
        fused = nn.Conv(self.num_feat, (3, 3), dtype=self.dtype, name='fusion')(
            jnp.concatenate([feat_prop, kf_feat], axis=-1))
        feat_prop = jnp.where(is_kf > 0, fused, feat_prop)
        cat = [x_i, extra, feat_prop] if self.with_extra else [x_i, feat_prop]
        feat_prop = ConvResidualBlocks(self.num_feat, self.num_block, dtype=self.dtype,
                                       name='trunk')(jnp.concatenate(cat, axis=-1))
        return (feat_prop, kf_feats), feat_prop


@ARCH_REGISTRY.register()
class IconVSR(nn.Module):
    """(reference basicvsr_arch.py:120-268)"""
    # torch: flat backward_trunk.main.* / backward_fusion.*; here both live
    # inside the scanned step module prop_backward.{trunk,fusion}. The EDVR
    # extractor's PCD ModuleDict levels need the same .l3. -> _l3. fuse as
    # the EDVR arch itself.
    TORCH_KEY_RULES = ((r'^(backward|forward)_trunk\.main\.', r'prop_\1.trunk.main.'),
                       (r'^(backward|forward)_fusion\.', r'prop_\1.fusion.'),
                       (r'\.(l\d)\.', r'_\1.'))

    num_feat: int = 64
    num_block: int = 15
    keyframe_stride: int = 5
    temporal_padding: int = 2
    spynet_path: Optional[str] = None
    edvr_path: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        b, n, h_in, w_in, c = x.shape
        # pad spatially to multiples of 4 (PCD requirement, reference :169-189)
        pad_h = (4 - h_in % 4) % 4
        pad_w = (4 - w_in % 4) % 4
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode='reflect')
        h, w = x.shape[2], x.shape[3]

        keyframe_idx = list(range(0, n, self.keyframe_stride))
        if keyframe_idx[-1] != n - 1:
            keyframe_idx.append(n - 1)

        spynet = SpyNet(dtype=self.dtype, name='spynet')
        x1 = x[:, :-1].reshape(-1, h, w, c)
        x2 = x[:, 1:].reshape(-1, h, w, c)
        # both flow directions in ONE SpyNet body (2x batch)
        flows = spynet(jnp.concatenate([x1, x2], axis=0),
                       jnp.concatenate([x2, x1], axis=0))
        flows_backward, flows_forward = (f.reshape(b, n - 1, h, w, 2)
                                         for f in jnp.split(flows, 2, axis=0))

        # keyframe features via EDVR (reference get_keyframe_feature :205-216)
        tp = self.temporal_padding
        if tp == 2:
            x_pad = jnp.concatenate([x[:, (4, 3), ...], x, x[:, (-4, -5), ...]], axis=1)
        elif tp == 3:
            x_pad = jnp.concatenate([x[:, (6, 5, 4), ...], x, x[:, (-5, -6, -7), ...]], axis=1)
        else:
            raise ValueError(f'Unsupported temporal_padding {tp}')
        num_frames = 2 * tp + 1
        edvr = EDVRFeatureExtractor(num_frames, self.num_feat, dtype=self.dtype, name='edvr')
        # one extractor body at batch b*K instead of K unrolled bodies
        # (reference loops get_keyframe_feature per keyframe, :205-216)
        kf_windows = jnp.concatenate([x_pad[:, i:i + num_frames] for i in keyframe_idx], axis=0)
        kf_feats = edvr(kf_windows).reshape(len(keyframe_idx), b, h, w, self.num_feat)

        # per-step keyframe metadata (frame order)
        kf_pos = [keyframe_idx.index(i) if i in keyframe_idx else 0 for i in range(n)]
        kf_idx = jnp.asarray(kf_pos, jnp.int32).reshape(1, n)
        # (1, n, 1, 1, 1): per-step slices broadcast inside jnp.where
        is_kf = jnp.asarray([1. if i in keyframe_idx else 0. for i in range(n)],
                            x.dtype).reshape(1, n, 1, 1, 1)

        zero_flow = jnp.zeros((b, 1, h, w, 2), x.dtype)
        init = jnp.zeros((b, h, w, self.num_feat), x.dtype)

        def _scan(reverse):
            return nn.scan(_IconPropStep, variable_broadcast='params',
                           split_rngs={'params': False}, in_axes=1, out_axes=1,
                           reverse=reverse)

        # backward branch: dummy zero flow on the first (=last) step, where
        # warping the zero init is a no-op either way
        flows_b = jnp.concatenate([flows_backward, zero_flow], axis=1)
        _, out_l = _scan(True)(self.num_feat, self.num_block, with_extra=False,
                               dtype=self.dtype, name='prop_backward')(
                                   (init, kf_feats), (x, flows_b, kf_idx, is_kf))

        # forward branch consumes the backward features per frame
        flows_f = jnp.concatenate([zero_flow, flows_forward], axis=1)
        _, feats = _scan(False)(self.num_feat, self.num_block, with_extra=True,
                                dtype=self.dtype, name='prop_forward')(
                                    (init, kf_feats), (x, out_l, flows_f, kf_idx, is_kf))

        upconv1 = nn.Conv(self.num_feat * 4, (3, 3), dtype=self.dtype, name='upconv1')
        upconv2 = nn.Conv(64 * 4, (3, 3), dtype=self.dtype, name='upconv2')
        conv_hr = nn.Conv(64, (3, 3), dtype=self.dtype, name='conv_hr')
        conv_last = nn.Conv(3, (3, 3), dtype=self.dtype, name='conv_last')

        # reconstruction head, batched over frames
        feat_all = feats.reshape(b * n, h, w, self.num_feat)
        out = _lrelu(pixel_shuffle(upconv1(feat_all), 2))
        out = _lrelu(pixel_shuffle(upconv2(out), 2))
        out = _lrelu(conv_hr(out))
        out = conv_last(out)
        out = out + resize_bilinear(x.reshape(b * n, h, w, c), h * 4, w * 4)
        return out.reshape(b, n, h * 4, w * 4, 3)[:, :, :4 * h_in, :4 * w_in]
