"""VGG feature extractor for perceptual losses and LPIPS-style metrics
(reference: basicsr/archs/vgg_arch.py:9-161).

Weights: torchvision pretrained weights are not downloadable in a zero-egress
environment. The extractor loads a torchvision-format ``.pth`` when one is
available (``VGG_PRETRAIN_PATH`` env/arg, converted OIHW->HWIO) and otherwise
falls back to a fixed-seed random init with a logged warning — feature
*shapes* and the loss plumbing stay exact; numerics require the weight file.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..utils.logger import get_root_logger
from ..utils.registry import ARCH_REGISTRY

VGG_PRETRAIN_PATH = os.environ.get('BASICSR4RS_TPU_VGG19_PATH',
                                   'experiments/pretrained_models/vgg19-dcbb9e9d.pth')

# Layer-name sequences per VGG variant (architecture spec, reference NAMES
# table vgg_arch.py:10-33).
_CFG = {
    'vgg11': [64, 'M', 128, 'M', 256, 256, 'M', 512, 512, 'M', 512, 512, 'M'],
    'vgg13': [64, 64, 'M', 128, 128, 'M', 256, 256, 'M', 512, 512, 'M', 512, 512, 'M'],
    'vgg16': [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 'M', 512, 512, 512, 'M', 512, 512, 512, 'M'],
    'vgg19': [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 256, 'M', 512, 512, 512, 512, 'M',
              512, 512, 512, 512, 'M'],
}


def vgg_layer_names(vgg_type: str) -> List[str]:
    names = []
    block, conv_idx = 1, 1
    for v in _CFG[vgg_type]:
        if v == 'M':
            names.append(f'pool{block}')
            block += 1
            conv_idx = 1
        else:
            names.append(f'conv{block}_{conv_idx}')
            names.append(f'relu{block}_{conv_idx}')
            conv_idx += 1
    return names


@ARCH_REGISTRY.register()
class VGGFeatureExtractor(nn.Module):
    """Extract features at named layers (reference vgg_arch.py:55-161). NHWC.

    Args:
        layer_name_list: names whose outputs to return, e.g. ['conv5_4'].
        use_input_norm: normalize input by ImageNet mean/std.
        range_norm: map [-1, 1] inputs to [0, 1] first.
        remove_pooling: skip maxpool layers.
    """
    layer_name_list: Sequence[str]
    vgg_type: str = 'vgg19'
    use_input_norm: bool = True
    range_norm: bool = False
    requires_grad: bool = False
    remove_pooling: bool = False
    pooling_stride: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        if self.range_norm:
            x = (x + 1) / 2
        if self.use_input_norm:
            mean = jnp.asarray([0.485, 0.456, 0.406], x.dtype)
            std = jnp.asarray([0.229, 0.224, 0.225], x.dtype)
            x = (x - mean) / std

        names = vgg_layer_names(self.vgg_type)
        # deepest needed layer
        max_idx = max(names.index(v) for v in self.layer_name_list)

        outputs = {}
        for name in names[:max_idx + 1]:
            if name.startswith('conv'):
                x = nn.Conv(int(_channels_for(self.vgg_type, name)), (3, 3),
                            dtype=self.dtype, name=name)(x)
            elif name.startswith('relu'):
                x = nn.relu(x)
            elif name.startswith('pool'):
                if not self.remove_pooling:
                    x = nn.max_pool(x, (2, 2), strides=(self.pooling_stride, self.pooling_stride))
            if name in self.layer_name_list:
                outputs[name] = x
        return outputs


def _channels_for(vgg_type: str, conv_name: str) -> int:
    names = vgg_layer_names(vgg_type)
    convs = [n for n in names if n.startswith('conv')]
    channels = [c for c in _CFG[vgg_type] if c != 'M']
    return channels[convs.index(conv_name)]


def load_vgg_params(extractor: VGGFeatureExtractor, rng=None, pretrain_path: str = None):
    """Init params; overwrite with converted torchvision weights when the
    file exists (reference loads torchvision directly, vgg_arch.py:78-95)."""
    logger = get_root_logger()
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = extractor.init(rng, dummy)['params']

    path = pretrain_path or VGG_PRETRAIN_PATH
    if os.path.isfile(path):
        import torch
        state = torch.load(path, map_location='cpu', weights_only=True)
        # torchvision keys: features.{idx}.weight — map idx -> conv name
        names = vgg_layer_names(extractor.vgg_type)
        idx2name = {i: n for i, n in enumerate(names)}
        new = {}
        for k, v in state.items():
            if not k.startswith('features.'):
                continue
            idx = int(k.split('.')[1])
            name = idx2name.get(idx)
            if name is None or not name.startswith('conv'):
                continue
            leaf = 'kernel' if k.endswith('weight') else 'bias'
            arr = v.numpy()
            if leaf == 'kernel':
                arr = np.transpose(arr, (2, 3, 1, 0))
            new.setdefault(name, {})[leaf] = jnp.asarray(arr)
        for name, leaves in new.items():
            if name in params:
                params[name] = leaves
        logger.info(f'VGG weights loaded from {path}')
    else:
        logger.warning(f'VGG pretrained weights not found at {path}; using random '
                       'init — perceptual-loss numerics will not match the reference.')
    return params
