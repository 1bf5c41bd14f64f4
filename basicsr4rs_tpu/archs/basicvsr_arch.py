"""BasicVSR / IconVSR — recurrent bidirectional video SR
(reference: basicsr/archs/basicvsr_arch.py:12-336). NHWC, frames (B,T,H,W,C).

TPU-native notes: the temporal recurrence is a lifted ``nn.scan`` (compile
time independent of T; params broadcast across steps), and the per-frame
reconstruction head runs batched over (B*T) frames — bigger matmuls for the
MXU than the reference's per-frame python loop. IconVSR keeps a python loop
because of sparse keyframe refills (T is small in training).
"""

from __future__ import annotations

from typing import Any, List, Optional

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
        flows_backward = spynet(x1, x2).reshape(b, t - 1, h, w, 2)
        flows_forward = spynet(x2, x1).reshape(b, t - 1, h, w, 2)

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


@ARCH_REGISTRY.register()
class IconVSR(nn.Module):
    """(reference basicvsr_arch.py:120-268)"""
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
        flows_backward = spynet(x1, x2).reshape(b, n - 1, h, w, 2)
        flows_forward = spynet(x2, x1).reshape(b, n - 1, h, w, 2)

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
        feats_keyframe = {i: edvr(x_pad[:, i:i + num_frames]) for i in keyframe_idx}

        backward_trunk = ConvResidualBlocks(self.num_feat, self.num_block,
                                            dtype=self.dtype, name='backward_trunk')
        forward_trunk = ConvResidualBlocks(self.num_feat, self.num_block,
                                           dtype=self.dtype, name='forward_trunk')
        backward_fusion = nn.Conv(self.num_feat, (3, 3), dtype=self.dtype, name='backward_fusion')
        forward_fusion = nn.Conv(self.num_feat, (3, 3), dtype=self.dtype, name='forward_fusion')

        # backward branch (python loop: keyframe refills are sparse/static)
        out_l: List[Any] = [None] * n
        feat_prop = jnp.zeros((b, h, w, self.num_feat), x.dtype)
        for i in range(n - 1, -1, -1):
            x_i = x[:, i]
            if i < n - 1:
                feat_prop = flow_warp(feat_prop, flows_backward[:, i])
            if i in keyframe_idx:
                feat_prop = backward_fusion(jnp.concatenate([feat_prop, feats_keyframe[i]], axis=-1))
            feat_prop = backward_trunk(jnp.concatenate([x_i, feat_prop], axis=-1))
            out_l[i] = feat_prop

        upconv1 = nn.Conv(self.num_feat * 4, (3, 3), dtype=self.dtype, name='upconv1')
        upconv2 = nn.Conv(64 * 4, (3, 3), dtype=self.dtype, name='upconv2')
        conv_hr = nn.Conv(64, (3, 3), dtype=self.dtype, name='conv_hr')
        conv_last = nn.Conv(3, (3, 3), dtype=self.dtype, name='conv_last')

        # forward branch
        feat_prop = jnp.zeros_like(feat_prop)
        feats = []
        for i in range(n):
            x_i = x[:, i]
            if i > 0:
                feat_prop = flow_warp(feat_prop, flows_forward[:, i - 1])
            if i in keyframe_idx:
                feat_prop = forward_fusion(jnp.concatenate([feat_prop, feats_keyframe[i]], axis=-1))
            feat_prop = forward_trunk(jnp.concatenate([x_i, out_l[i], feat_prop], axis=-1))
            feats.append(feat_prop)

        # reconstruction head, batched over frames
        feat_all = jnp.stack(feats, axis=1).reshape(b * n, h, w, self.num_feat)
        out = _lrelu(pixel_shuffle(upconv1(feat_all), 2))
        out = _lrelu(pixel_shuffle(upconv2(out), 2))
        out = _lrelu(conv_hr(out))
        out = conv_last(out)
        out = out + resize_bilinear(x.reshape(b * n, h, w, c), h * 4, w * 4)
        return out.reshape(b, n, h * 4, w * 4, 3)[:, :, :4 * h_in, :4 * w_in]
