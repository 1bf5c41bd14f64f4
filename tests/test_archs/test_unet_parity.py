"""Torch parity for the ResShift UNets (UNetModelSwin) and autoencoder."""

import sys
from os import path as osp

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
from ref_loader import load_ref_module  # noqa: E402

from basicsr4rs_tpu.utils.torch_convert import convert_torch_state_dict  # noqa: E402


def test_unet_model_swin_parity():
    import torch
    from basicsr4rs_tpu.archs.unet_arch import UNetModelSwin
    ref_mod = load_ref_module('basicsr/archs/unet_arch.py')
    kwargs = dict(image_size=16, in_channels=3, model_channels=32, out_channels=3,
                  num_res_blocks=1, attention_resolutions=[8], channel_mult=[1, 2],
                  num_heads=4, swin_embed_dim=32, window_size=4, cond_lq=True,
                  lq_size=16)
    ref_net = ref_mod.UNetModelSwin(**kwargs).eval()
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 16, 16).astype(np.float32)
    t = np.array([1, 3], np.int64)
    lq = rng.randn(2, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_net(torch.from_numpy(x), torch.from_numpy(t),
                          lq=torch.from_numpy(lq)).numpy()

    mine = UNetModelSwin(**kwargs)
    params = convert_torch_state_dict(ref_net.state_dict(),
                                      rules=getattr(UNetModelSwin, 'TORCH_KEY_RULES', None))
    out = mine.apply({'params': params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
                     jnp.asarray(t), lq=jnp.asarray(lq.transpose(0, 2, 3, 1)))
    out = np.asarray(out).transpose(0, 3, 1, 2)
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, atol=1e-4, rtol=1e-3)
