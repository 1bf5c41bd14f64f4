"""DFDNet: deep face dictionary network
(reference: basicsr/archs/dfdnet_arch.py:12-169).

TPU-native design: DFDNet is an inference-only face restorer whose part-swap
step has data-dependent geometry (eye/nose/mouth boxes vary per image), which
cannot live inside one static XLA program. We split it the TPU way:

* the heavy conv pipelines (VGG tower, MSDilation, SFT decoder) are ordinary
  flax modules — jit-compiled, MXU-bound;
* the tiny dictionary swap (crop -> AdaIN -> dot-product similarity ->
  argmax -> paste) runs eagerly on concrete arrays between them, exactly as
  the reference does per part. Its FLOPs are negligible (dict entries are
  tiny crops), so nothing of consequence leaves the accelerator.

The facial-component dictionary is passed to ``__call__`` as a pytree
(``load_dfdnet_dict`` converts the reference's torch ``dict_path`` file);
network weights stay checkpoint-convertible key-for-key.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..utils.registry import ARCH_REGISTRY
from .arch_util import resize_bilinear
from .dfdnet_util import MSDilationBlock, UpResBlock, adaptive_instance_normalization, blur
from .hifacegan_util import SNConv2d, nearest_resize_to
from .vgg_arch import VGGFeatureExtractor


def load_dfdnet_dict(dict_path: str) -> Dict[str, Dict[str, np.ndarray]]:
    """Load the reference facial-component dictionary (torch ``.pth`` of
    ``{size: {part: (N, C, h, w)}}``) as NHWC numpy."""
    import torch
    d = torch.load(dict_path, map_location='cpu', weights_only=True)
    return {k: {kk: np.transpose(vv.numpy(), (0, 2, 3, 1)) for kk, vv in v.items()}
            for k, v in d.items()}


class SFTUpBlock(nn.Module):
    """Spatial-feature-transform + upsample block
    (reference dfdnet_arch.py:12-54). Conv names follow the torch
    Sequential indices."""
    in_channel: int
    out_channel: int
    kernel_size: int = 3
    padding: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, updated_feat):
        h = blur(x)
        h = SNConv2d(self.out_channel, self.kernel_size, 1, self.padding,
                     dtype=self.dtype, name='conv1_1')(h)
        h = nn.leaky_relu(h, 0.04)  # two stacked 0.2-lrelus in the official code
        scale = SNConv2d(self.out_channel, 3, 1, 1, dtype=self.dtype,
                         name='scale_block_0')(updated_feat)
        scale = SNConv2d(self.out_channel, 3, 1, 1, dtype=self.dtype,
                         name='scale_block_2')(nn.leaky_relu(scale, 0.2))
        shift = SNConv2d(self.out_channel, 3, 1, 1, dtype=self.dtype,
                         name='shift_block_0')(updated_feat)
        shift = SNConv2d(self.out_channel, 3, 1, 1, dtype=self.dtype,
                         name='shift_block_2')(nn.leaky_relu(shift, 0.2))
        shift = nn.sigmoid(shift)
        h = h * scale + shift
        h = resize_bilinear(h, h.shape[1] * 2, h.shape[2] * 2)
        h = SNConv2d(self.out_channel, self.kernel_size, 1, self.padding,
                     dtype=self.dtype, name='convup_1')(h)
        return nn.leaky_relu(h, 0.2)


class _AttnBlocks(nn.Module):
    """Per-part/per-scale attention convs, named so the torch ModuleDict keys
    (``attn_blocks.left_eye_256.0`` etc.) convert directly."""
    parts: Sequence[str]
    feature_sizes: Sequence[int]
    channel_sizes: Sequence[int]
    dtype: Any = None

    def setup(self):
        convs = {}
        for ch, f_size in zip(self.channel_sizes, self.feature_sizes):
            for part in self.parts:
                for idx in (0, 2):
                    convs[f'{part}_{f_size}_{idx}'] = SNConv2d(
                        ch, 3, 1, 1, dtype=self.dtype, name=f'{part}_{f_size}_{idx}')
        self._convs = convs

    def attend(self, part_name: str, f_size: int, x):
        h = self._convs[f'{part_name}_{f_size}_0'](x)
        h = nn.leaky_relu(h, 0.2)
        return self._convs[f'{part_name}_{f_size}_2'](h)

    def __call__(self, x):
        # init path: touch every conv once
        for ch, f_size in zip(self.channel_sizes, self.feature_sizes):
            for part in self.parts:
                self.attend(part, f_size, jnp.zeros((1, 4, 4, ch), jnp.float32))
        return x


@ARCH_REGISTRY.register()
class DFDNet(nn.Module):
    """(reference dfdnet_arch.py:57-169). Faces are 512x512; the component
    dictionary is passed per call (see ``load_dfdnet_dict``)."""
    num_feat: int
    dict_path: str = ''   # kept for config parity; load the dict separately
    dtype: Any = None

    parts = ('left_eye', 'right_eye', 'nose', 'mouth')
    feature_sizes = (256, 128, 64, 32)
    channel_sizes = (128, 256, 512, 512)
    vgg_layers = ('relu2_2', 'relu3_4', 'relu4_4', 'conv5_4')

    def setup(self):
        self.vgg_extractor = VGGFeatureExtractor(
            layer_name_list=list(self.vgg_layers), vgg_type='vgg19',
            use_input_norm=True, range_norm=True, dtype=self.dtype)
        self.attn_blocks = _AttnBlocks(self.parts, self.feature_sizes,
                                       self.channel_sizes, dtype=self.dtype)
        nf = self.num_feat
        self.multi_scale_dilation = MSDilationBlock(nf * 8, dilation=(4, 3, 2, 1),
                                                    dtype=self.dtype)
        self.upsample0 = SFTUpBlock(nf * 8, nf * 8, dtype=self.dtype)
        self.upsample1 = SFTUpBlock(nf * 8, nf * 4, dtype=self.dtype)
        self.upsample2 = SFTUpBlock(nf * 4, nf * 2, dtype=self.dtype)
        self.upsample3 = SFTUpBlock(nf * 2, nf, dtype=self.dtype)
        self.upsample4_0 = SNConv2d(nf, 3, 1, 1, dtype=self.dtype)
        self.upsample4_2 = UpResBlock(nf, dtype=self.dtype)
        self.upsample4_3 = UpResBlock(nf, dtype=self.dtype)
        self.upsample4_4 = nn.Conv(3, (3, 3), padding=1, dtype=self.dtype)

    # torchvision wraps the conv stack in ``vgg_net``; our extractor is flat
    TORCH_KEY_RULES = ((r'vgg_extractor\.vgg_net\.', 'vgg_extractor.'),)

    def swap_feat(self, vgg_feat, updated_feat, dict_feat, location, part_name, f_size):
        """Dictionary swap for one part (reference dfdnet_arch.py:107-127).
        ``location`` must be concrete host ints (eager-only)."""
        x0, y0, x1, y1 = [int(v) for v in location]
        part_feat = vgg_feat[:, y0:y1, x0:x1, :]
        dh, dw = dict_feat.shape[1:3]
        part_resize_feat = _resize_bilinear_to(part_feat, (dh, dw))
        dict_feat = adaptive_instance_normalization(dict_feat, part_resize_feat)
        # similarity: VALID conv of the part against every dict entry == dot
        sim = jnp.einsum('hwc,nhwc->n', part_resize_feat[0], dict_feat)
        sim = nn.softmax(sim.reshape(-1), axis=0)
        select_idx = int(jnp.argmax(sim))
        swap = nearest_resize_to(dict_feat[select_idx:select_idx + 1],
                                 (y1 - y0, x1 - x0))
        attn = self.attn_blocks.attend(part_name, f_size, swap - part_feat)
        attn_feat = attn * swap
        return updated_feat.at[:, y0:y1, x0:x1, :].set(attn_feat + part_feat)

    def __call__(self, x, part_locations=None, dictionary=None):
        """x: (1, 512, 512, 3) in [-1, 1]; part_locations: per-part (b, 4)
        boxes at 512 scale; dictionary: output of ``load_dfdnet_dict``."""
        vgg_features = self.vgg_extractor(x)
        if part_locations is None:  # init / no-swap path
            updated = [vgg_features[name] for name in self.vgg_layers]
            _ = self.attn_blocks(x)
        else:
            updated = []
            batch = 0  # like the reference: single-face inference
            for vgg_layer, f_size in zip(self.vgg_layers, self.feature_sizes):
                dict_features = dictionary[f'{f_size}']
                vgg_feat = vgg_features[vgg_layer]
                updated_feat = vgg_feat
                for part_idx, part_name in enumerate(self.parts):
                    location = np.asarray(part_locations[part_idx][batch]) // (512 // f_size)
                    updated_feat = self.swap_feat(vgg_feat, updated_feat,
                                                  jnp.asarray(dict_features[part_name]),
                                                  location, part_name, f_size)
                updated.append(updated_feat)

        feat = self.multi_scale_dilation(vgg_features['conv5_4'])
        feat = self.upsample0(feat, updated[3])
        feat = self.upsample1(feat, updated[2])
        feat = self.upsample2(feat, updated[1])
        feat = self.upsample3(feat, updated[0])
        feat = nn.leaky_relu(self.upsample4_0(feat), 0.2)
        feat = self.upsample4_3(self.upsample4_2(feat))
        return jnp.tanh(self.upsample4_4(feat))


def _resize_bilinear_to(x, size):
    """torch bilinear (align_corners=False) to an arbitrary size."""
    return resize_bilinear(x, size[0], size[1])
