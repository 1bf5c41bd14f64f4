"""TPU-native replacements for the reference's hand-written CUDA ops and
hot pipelines (reference: basicsr/ops/*, SURVEY.md §2.6)."""

from .dcn import DCNv2Pack, ModulatedDeformConvPack, modulated_deform_conv
from .fused_act import FusedLeakyReLU, fused_leaky_relu, scaled_leaky_relu
from .tile import tiled_apply
from .upfirdn2d import upfirdn2d
from .window_attention import fused_window_attention, reference_window_attention

__all__ = [
    'DCNv2Pack', 'ModulatedDeformConvPack', 'modulated_deform_conv',
    'FusedLeakyReLU', 'fused_leaky_relu', 'scaled_leaky_relu',
    'tiled_apply', 'upfirdn2d', 'fused_window_attention',
    'reference_window_attention',
]
