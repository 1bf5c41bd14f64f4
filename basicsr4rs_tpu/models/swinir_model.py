"""SwinIRModel — pads the LQ to a window-size multiple before the forward and
crops the output back (reference: basicsr/models/swinir_model.py:12-79).
Padding also bounds jit recompilation: every eval shape is rounded up to the
window grid, and RS variants are thin composition aliases.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.registry import MODEL_REGISTRY
from .sr_model import SRModel


def pad_to_multiple(x: jnp.ndarray, multiple: int) -> jnp.ndarray:
    """Reflect-pad NHWC H/W up to the next multiple (reference
    swinir_model.py:20-30 uses flip-cat, equivalent to reflect for pad < size)."""
    _, h, w, _ = x.shape
    mod_pad_h = (multiple - h % multiple) % multiple
    mod_pad_w = (multiple - w % multiple) % multiple
    if mod_pad_h == 0 and mod_pad_w == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, mod_pad_h), (0, mod_pad_w), (0, 0)), mode='reflect')


@MODEL_REGISTRY.register()
class SwinIRModel(SRModel):

    def test(self):
        window_size = self.opt['network_g'].get('window_size', 8)
        scale = self.opt.get('scale', 1)
        lq = self.batch['lq']
        _, h_old, w_old, _ = lq.shape
        lq_padded = pad_to_multiple(lq, window_size)
        output = self._eval_apply(self._test_params(), lq_padded)
        self.output = output[:, :h_old * scale, :w_old * scale, :]


# RS variants compose the SwinIR window-pad test with the SRRS behaviors
# (CSV metrics, [-1,1] visuals, L2S band handling) via MRO, exactly like the
# reference (swinir_model.py:40-79).
from .srrs_l2s_model import L2SSingleModel  # noqa: E402
from .srrs_l2shm_model import L2SSingleHMModel  # noqa: E402
from .srrs_model import SRRSModel  # noqa: E402


@MODEL_REGISTRY.register()
class SwinIRRSModel(SwinIRModel, SRRSModel):
    pass


@MODEL_REGISTRY.register()
class SwinIRL2sModel(SwinIRModel, L2SSingleModel):
    pass


@MODEL_REGISTRY.register()
class SwinIRHMModel(L2SSingleHMModel):
    """Window-padded test over the dual-branch (gt/hm) output
    (reference swinir_model.py:50-79)."""

    def test(self):
        window_size = self.opt['network_g'].get('sr_net_args', {}).get('window_size') \
            or self.opt['network_g'].get('window_size', 8)
        scale = self.opt.get('scale', 1)
        lq = self.batch['lq']
        _, h_old, w_old, _ = lq.shape
        lq_padded = pad_to_multiple(lq, window_size)
        result = self._eval_apply(self._test_params(), lq_padded)

        def crop(img):
            return img[:, :h_old * scale, :w_old * scale, :]

        if isinstance(result, dict):
            result = {k: crop(v) for k, v in result.items()}
            self.output = result.get('gt', result.get('hm'))
            self.output_hm = result.get('hm')
        else:
            self.output = crop(result)
