"""SwinIR + StyleCNN dual-branch composite.

Referenced by the shipped configs ``options/train/SwinIR/
train_SwinIR_StyleCNN_L2S288_*.yml`` (model_type SwinIRHMModel) but absent
from the reference tree — the intent is reconstructed from the HM training
contract (reference srrs_l2shm_model.py:93-97: the network must return
``{'hm', 'gt'}``): a SwinIR backbone predicts in the histogram-matched
domain (radiometrically closest to the Landsat input) and a lightweight
residual style CNN maps that prediction into the true Sentinel domain.
"""

from __future__ import annotations

from typing import Any

from flax import linen as nn

from ..utils.registry import ARCH_REGISTRY
from .swinir_arch import SwinIR


class StyleCNN(nn.Module):
    """Residual 3-layer style mapper between radiometric domains."""
    in_chans: int = 6
    out_chans: int = 6
    num_feat: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.num_feat, (3, 3), dtype=self.dtype, name='conv_first')(x)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.num_feat, (3, 3), dtype=self.dtype, name='conv_body')(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.out_chans, (3, 3), dtype=self.dtype, name='conv_last')(h)
        return x + h if self.in_chans == self.out_chans else h


@ARCH_REGISTRY.register()
class SwinIR_StyleCNN(nn.Module):
    sr_net_args: dict
    style_net_args: dict
    dtype: Any = None

    def setup(self):
        self.sr_net = SwinIR(dtype=self.dtype, **self.sr_net_args)
        self.style_net = StyleCNN(dtype=self.dtype, **self.style_net_args)

    def __call__(self, x):
        hm = self.sr_net(x)
        gt = self.style_net(hm)
        return {'hm': hm, 'gt': gt}
