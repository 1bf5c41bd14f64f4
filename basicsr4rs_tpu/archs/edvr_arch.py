"""EDVR — video restoration with PCD alignment and TSA fusion
(reference: basicsr/archs/edvr_arch.py:9-382). NHWC; frames (B, T, H, W, C)."""

from __future__ import annotations

from typing import Any, List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.dcn import DCNv2Pack
from ..utils.registry import ARCH_REGISTRY
from .arch_util import ResidualBlockNoBN, pixel_shuffle, resize_bilinear


def _up2(x):
    n, h, w, c = x.shape
    return resize_bilinear(x, h * 2, w * 2)


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.1)


class PCDAlignment(nn.Module):
    """3-level pyramid cascaded deformable alignment (reference :9-97)."""
    num_feat: int = 64
    deformable_groups: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, nbr_feat_l: List[jnp.ndarray], ref_feat_l: List[jnp.ndarray]):
        conv = lambda name, ch=self.num_feat: nn.Conv(ch, (3, 3), dtype=self.dtype, name=name)  # noqa: E731
        upsampled_offset, upsampled_feat = None, None
        feat = None
        for i in range(3, 0, -1):
            level = f'l{i}'
            offset = jnp.concatenate([nbr_feat_l[i - 1], ref_feat_l[i - 1]], axis=-1)
            offset = _lrelu(conv(f'offset_conv1_{level}')(offset))
            if i == 3:
                offset = _lrelu(conv(f'offset_conv2_{level}')(offset))
            else:
                offset = _lrelu(conv(f'offset_conv2_{level}')(
                    jnp.concatenate([offset, upsampled_offset], axis=-1)))
                offset = _lrelu(conv(f'offset_conv3_{level}')(offset))

            feat = DCNv2Pack(self.num_feat, self.num_feat, 3, padding=1,
                             deformable_groups=self.deformable_groups,
                             dtype=self.dtype, name=f'dcn_pack_{level}')(nbr_feat_l[i - 1], offset)
            if i < 3:
                feat = conv(f'feat_conv_{level}')(jnp.concatenate([feat, upsampled_feat], axis=-1))
            if i > 1:
                feat = _lrelu(feat)
                upsampled_offset = _up2(offset) * 2
                upsampled_feat = _up2(feat)

        # Cascading
        offset = jnp.concatenate([feat, ref_feat_l[0]], axis=-1)
        offset = _lrelu(conv('cas_offset_conv2')(_lrelu(conv('cas_offset_conv1')(offset))))
        feat = _lrelu(DCNv2Pack(self.num_feat, self.num_feat, 3, padding=1,
                                deformable_groups=self.deformable_groups,
                                dtype=self.dtype, name='cas_dcnpack')(feat, offset))
        return feat


class TSAFusion(nn.Module):
    """Temporal-spatial attention fusion (reference :100-190)."""
    num_feat: int = 64
    num_frame: int = 5
    center_frame_idx: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, aligned_feat):
        """aligned_feat: (B, T, H, W, C) -> (B, H, W, C)."""
        b, t, h, w, c = aligned_feat.shape
        conv3 = lambda name, ch=self.num_feat: nn.Conv(ch, (3, 3), dtype=self.dtype, name=name)  # noqa: E731
        conv1 = lambda name, ch=self.num_feat: nn.Conv(ch, (1, 1), dtype=self.dtype, name=name)  # noqa: E731

        emb_ref = conv3('temporal_attn1')(aligned_feat[:, self.center_frame_idx])
        emb = conv3('temporal_attn2')(aligned_feat.reshape(-1, h, w, c)).reshape(b, t, h, w, -1)

        corr = jnp.sum(emb * emb_ref[:, None], axis=-1)                      # (b, t, h, w)
        corr_prob = jax.nn.sigmoid(corr)[..., None]                          # (b, t, h, w, 1)
        # channel layout parity: torch flattens (t, c) -> t*c channels
        feat_w = (aligned_feat * corr_prob).transpose(0, 2, 3, 1, 4).reshape(b, h, w, t * c)

        feat = _lrelu(conv1('feat_fusion')(feat_w))

        # spatial attention
        def max_pool(x):
            return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        def avg_pool(x):
            return nn.avg_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                               count_include_pad=True)

        attn = _lrelu(conv1('spatial_attn1')(feat_w))
        attn_max = max_pool(attn)
        attn_avg = avg_pool(attn)
        attn = _lrelu(conv1('spatial_attn2')(jnp.concatenate([attn_max, attn_avg], axis=-1)))
        attn_level = _lrelu(conv1('spatial_attn_l1')(attn))
        attn_max = max_pool(attn_level)
        attn_avg = avg_pool(attn_level)
        attn_level = _lrelu(conv3('spatial_attn_l2')(jnp.concatenate([attn_max, attn_avg], axis=-1)))
        attn_level = _up2(_lrelu(conv3('spatial_attn_l3')(attn_level)))

        attn = _lrelu(conv3('spatial_attn3')(attn)) + attn_level
        attn = _up2(_lrelu(conv1('spatial_attn4')(attn)))
        attn = conv3('spatial_attn5')(attn)
        attn_add = conv1('spatial_attn_add2')(_lrelu(conv1('spatial_attn_add1')(attn)))
        attn = jax.nn.sigmoid(attn)

        return feat * attn * 2 + attn_add


class PredeblurModule(nn.Module):
    """(reference :192-243)"""
    num_in_ch: int = 3
    num_feat: int = 64
    hr_in: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        conv3 = lambda name, s=1: nn.Conv(self.num_feat, (3, 3), strides=(s, s),  # noqa: E731
                                          padding=((1, 1), (1, 1)), dtype=self.dtype, name=name)
        feat_l1 = _lrelu(conv3('conv_first')(x))
        if self.hr_in:
            feat_l1 = _lrelu(conv3('stride_conv_hr1', 2)(feat_l1))
            feat_l1 = _lrelu(conv3('stride_conv_hr2', 2)(feat_l1))
        feat_l2 = _lrelu(conv3('stride_conv_l2', 2)(feat_l1))
        feat_l3 = _lrelu(conv3('stride_conv_l3', 2)(feat_l2))
        feat_l3 = _up2(ResidualBlockNoBN(self.num_feat, dtype=self.dtype, name='resblock_l3')(feat_l3))
        feat_l2 = ResidualBlockNoBN(self.num_feat, dtype=self.dtype, name='resblock_l2_1')(feat_l2) + feat_l3
        feat_l2 = _up2(ResidualBlockNoBN(self.num_feat, dtype=self.dtype, name='resblock_l2_2')(feat_l2))
        for i in range(2):
            feat_l1 = ResidualBlockNoBN(self.num_feat, dtype=self.dtype, name=f'resblock_l1_{i}')(feat_l1)
        feat_l1 = feat_l1 + feat_l2
        for i in range(2, 5):
            feat_l1 = ResidualBlockNoBN(self.num_feat, dtype=self.dtype, name=f'resblock_l1_{i}')(feat_l1)
        return feat_l1


@ARCH_REGISTRY.register()
class EDVR(nn.Module):
    """(reference :246-382). Input (B, T, H, W, C); output center frame x4."""
    TORCH_KEY_RULES = (
        (r'\.(l\d)\.', r'_\1.'),  # ModuleDict levels: offset_conv1.l3 -> offset_conv1_l3
    )

    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_frame: int = 5
    deformable_groups: int = 8
    num_extract_block: int = 5
    num_reconstruct_block: int = 10
    center_frame_idx: Optional[int] = None
    hr_in: bool = False
    with_predeblur: bool = False
    with_tsa: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        center = self.center_frame_idx if self.center_frame_idx is not None else self.num_frame // 2
        if self.hr_in:
            assert h % 16 == 0 and w % 16 == 0, 'The height and width must be multiple of 16.'
        else:
            assert h % 4 == 0 and w % 4 == 0, 'The height and width must be multiple of 4.'
        x_center = x[:, center]

        flat = x.reshape(-1, h, w, c)
        if self.with_predeblur:
            feat_l1 = PredeblurModule(self.num_in_ch, self.num_feat, self.hr_in,
                                      dtype=self.dtype, name='predeblur')(flat)
            feat_l1 = nn.Conv(self.num_feat, (1, 1), dtype=self.dtype, name='conv_1x1')(feat_l1)
            if self.hr_in:
                h, w = h // 4, w // 4
        else:
            feat_l1 = _lrelu(nn.Conv(self.num_feat, (3, 3), dtype=self.dtype, name='conv_first')(flat))

        for i in range(self.num_extract_block):
            feat_l1 = ResidualBlockNoBN(self.num_feat, dtype=self.dtype,
                                        name=f'feature_extraction_{i}')(feat_l1)
        feat_l2 = _lrelu(nn.Conv(self.num_feat, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                                 dtype=self.dtype, name='conv_l2_1')(feat_l1))
        feat_l2 = _lrelu(nn.Conv(self.num_feat, (3, 3), dtype=self.dtype, name='conv_l2_2')(feat_l2))
        feat_l3 = _lrelu(nn.Conv(self.num_feat, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                                 dtype=self.dtype, name='conv_l3_1')(feat_l2))
        feat_l3 = _lrelu(nn.Conv(self.num_feat, (3, 3), dtype=self.dtype, name='conv_l3_2')(feat_l3))

        feat_l1 = feat_l1.reshape(b, t, h, w, -1)
        feat_l2 = feat_l2.reshape(b, t, h // 2, w // 2, -1)
        feat_l3 = feat_l3.reshape(b, t, h // 4, w // 4, -1)

        # The reference aligns each neighbor in a python loop over t
        # (edvr_arch.py:204-210) — t unrolled PCD/DCN bodies with batch b.
        # PCD is per-sample, so fold frames into the batch axis instead:
        # ONE body at batch b*t (t-times-larger MXU matmuls at these small
        # spatial dims, and compile time independent of num_frame).
        pcd = PCDAlignment(self.num_feat, self.deformable_groups, dtype=self.dtype, name='pcd_align')
        nbr_feat_l = [feat_l1.reshape(b * t, h, w, -1),
                      feat_l2.reshape(b * t, h // 2, w // 2, -1),
                      feat_l3.reshape(b * t, h // 4, w // 4, -1)]
        ref_feat_l = [jnp.repeat(feats[:, center:center + 1], t, axis=1)
                      .reshape(b * t, *feats.shape[2:])
                      for feats in (feat_l1, feat_l2, feat_l3)]
        aligned_feat = pcd(nbr_feat_l, ref_feat_l).reshape(b, t, h, w, -1)

        if self.with_tsa:
            feat = TSAFusion(self.num_feat, self.num_frame, center, dtype=self.dtype,
                             name='fusion')(aligned_feat)
        else:
            af = aligned_feat.transpose(0, 2, 3, 1, 4).reshape(b, h, w, t * self.num_feat)
            feat = nn.Conv(self.num_feat, (1, 1), dtype=self.dtype, name='fusion')(af)

        out = feat
        for i in range(self.num_reconstruct_block):
            out = ResidualBlockNoBN(self.num_feat, dtype=self.dtype, name=f'reconstruction_{i}')(out)
        out = _lrelu(pixel_shuffle(nn.Conv(self.num_feat * 4, (3, 3), dtype=self.dtype,
                                           name='upconv1')(out), 2))
        out = _lrelu(pixel_shuffle(nn.Conv(64 * 4, (3, 3), dtype=self.dtype, name='upconv2')(out), 2))
        out = _lrelu(nn.Conv(64, (3, 3), dtype=self.dtype, name='conv_hr')(out))
        out = nn.Conv(3, (3, 3), dtype=self.dtype, name='conv_last')(out)
        if self.hr_in:
            base = x_center
        else:
            base = resize_bilinear(x_center, x_center.shape[1] * 4, x_center.shape[2] * 4)
        return out + base
