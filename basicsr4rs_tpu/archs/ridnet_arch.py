"""RIDNet — Real Image Denoising with Feature Attention
(reference: basicsr/archs/ridnet_arch.py:8-180)."""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..utils.registry import ARCH_REGISTRY
from .arch_util import ChannelAttention, ResidualBlockNoBN


def MeanShift(rgb_range, rgb_mean, rgb_std, sign=-1, dtype=None, name=None) -> nn.Conv:
    """1x1 conv initialized as a mean/std shift (reference ridnet_arch.py:8-29).
    Returns a plain nn.Conv so checkpoint keys land at ``{name}.kernel/bias``;
    parameters remain trainable like the reference's."""
    std = np.asarray(rgb_std, np.float32)

    def kernel_init(rng, shape, dt=jnp.float32):
        # HWIO (1,1,3,3): identity / std
        return jnp.asarray((np.eye(3) / std[:, None]).T[None, None], dt)

    def bias_init(rng, shape, dt=jnp.float32):
        return jnp.asarray(sign * rgb_range * np.asarray(rgb_mean) / std, dt)

    return nn.Conv(3, (1, 1), kernel_init=kernel_init, bias_init=bias_init,
                   dtype=dtype, name=name)


class EResidualBlockNoBN(nn.Module):
    """conv-relu-conv-relu-conv1x1 with post-add relu (reference :32-53)."""
    out_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        out = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name='body_0')(x)
        out = nn.relu(out)
        out = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name='body_2')(out)
        out = nn.relu(out)
        out = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name='body_4')(out)
        return nn.relu(out + x)


class MergeRun(nn.Module):
    """Two dilated branches + aggregation (reference :55-85)."""
    out_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        def conv(name, v, dilation, padding):
            return nn.Conv(self.out_channels, (3, 3), kernel_dilation=(dilation, dilation),
                           padding=padding, dtype=self.dtype, name=name)(v)

        d1 = nn.relu(conv('dilation1_0', x, 1, 1))
        d1 = nn.relu(conv('dilation1_2', d1, 2, 2))
        d2 = nn.relu(conv('dilation2_0', x, 3, 3))
        d2 = nn.relu(conv('dilation2_2', d2, 4, 4))
        out = jnp.concatenate([d1, d2], axis=-1)
        out = nn.relu(nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name='aggregation_0')(out))
        return out + x


class EAM(nn.Module):
    """Enhancement attention module (reference :106-137)."""
    mid_channels: int
    out_channels: int
    squeeze_factor: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        out = MergeRun(self.mid_channels, dtype=self.dtype, name='merge')(x)
        out = nn.relu(ResidualBlockNoBN(self.mid_channels, dtype=self.dtype, name='block1')(out))
        out = EResidualBlockNoBN(self.out_channels, dtype=self.dtype, name='block2')(out)
        return ChannelAttention(self.out_channels, self.squeeze_factor, dtype=self.dtype, name='ca')(out)


@ARCH_REGISTRY.register()
class RIDNet(nn.Module):
    # CA attention Sequential indices + MergeRun/EResidual Sequential names.
    TORCH_KEY_RULES = (
        (r'\.ca\.attention\.1\.', '.ca.squeeze.'),
        (r'\.ca\.attention\.3\.', '.ca.excite.'),
    )

    in_channels: int = 3
    mid_channels: int = 64
    out_channels: int = 3
    num_block: int = 4
    img_range: float = 255.
    rgb_mean: Tuple[float, float, float] = (0.4488, 0.4371, 0.4040)
    rgb_std: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        res = MeanShift(self.img_range, self.rgb_mean, self.rgb_std, -1,
                        dtype=self.dtype, name='sub_mean')(x)
        res = nn.relu(nn.Conv(self.mid_channels, (3, 3), dtype=self.dtype, name='head')(res))
        for i in range(self.num_block):
            res = EAM(self.mid_channels, self.mid_channels, dtype=self.dtype, name=f'body_{i}')(res)
        res = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name='tail')(res)
        res = MeanShift(self.img_range, self.rgb_mean, self.rgb_std, 1,
                        dtype=self.dtype, name='add_mean')(res)
        return x + res


# EAM module-list in torch is `body.{i}` via make_layer — matches our
# f'body_{i}' naming through the default digit-fusing conversion.
