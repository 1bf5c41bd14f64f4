"""SwinIR forward parity vs the reference torch implementation."""

import sys
from os import path as osp

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))
from ref_loader import load_ref_module  # noqa: E402

from basicsr4rs_tpu.utils.torch_convert import convert_torch_state_dict  # noqa: E402


def _swinir_pair(**overrides):
    kwargs = dict(img_size=16, patch_size=1, in_chans=3, embed_dim=12,
                  depths=(2, 2), num_heads=(2, 2), window_size=8, mlp_ratio=2.,
                  upscale=2, img_range=1., upsampler='pixelshuffle',
                  resi_connection='1conv')
    kwargs.update(overrides)
    ref_mod = load_ref_module('basicsr/archs/swinir_arch.py')
    ref_net = ref_mod.SwinIR(**kwargs).eval()
    from basicsr4rs_tpu.archs.swinir_arch import SwinIR
    mine = SwinIR(**{**kwargs, 'depths': tuple(kwargs['depths']),
                     'num_heads': tuple(kwargs['num_heads'])})
    return ref_net, mine


@pytest.mark.parametrize('upsampler,upscale', [('pixelshuffle', 2), ('pixelshuffledirect', 2),
                                               ('nearest+conv', 4), ('', 1)])
def test_swinir_parity(upsampler, upscale):
    import torch
    ref_net, mine = _swinir_pair(upsampler=upsampler, upscale=upscale)
    x = np.random.RandomState(0).rand(1, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_net(torch.from_numpy(x)).numpy()
    params = convert_torch_state_dict(ref_net.state_dict(), rules=mine.torch_key_rules)
    my_out = mine.apply({'params': params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    my_out = np.asarray(my_out).transpose(0, 3, 1, 2)
    assert my_out.shape == ref_out.shape
    np.testing.assert_allclose(my_out, ref_out, atol=5e-5, rtol=1e-4)


def test_swinir_shifted_windows_parity():
    """24x24 input with window 8 exercises shifted-window masking."""
    import torch
    ref_net, mine = _swinir_pair(img_size=24, depths=(2,), num_heads=(2,))
    x = np.random.RandomState(1).rand(1, 3, 24, 24).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_net(torch.from_numpy(x)).numpy()
    params = convert_torch_state_dict(ref_net.state_dict(), rules=mine.torch_key_rules)
    my_out = np.asarray(mine.apply({'params': params}, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(my_out.transpose(0, 3, 1, 2), ref_out, atol=5e-5, rtol=1e-4)


def test_swinir_model_padding(tmp_path):
    """SwinIRModel pads non-multiple inputs and crops the output."""
    import os
    from basicsr4rs_tpu.models import build_model
    from basicsr4rs_tpu.utils.options import yaml_load
    opt = yaml_load("""
name: t
model_type: SwinIRModel
scale: 2
num_gpu: 1
manual_seed: 0
is_train: false
dist: false
rank: 0
world_size: 1
network_g: {type: SwinIR, img_size: 16, in_chans: 3, embed_dim: 12, depths: [2], num_heads: [2],
            window_size: 8, mlp_ratio: 2, upscale: 2, upsampler: pixelshuffledirect}
path: {pretrain_network_g: ~}
val:
  metrics:
    psnr: {type: calculate_psnr, crop_border: 2}
""")
    model = build_model(opt)
    lq = np.random.RandomState(0).rand(1, 13, 21, 3).astype(np.float32)
    model.feed_data({'lq': lq})
    model.test()
    assert model.output.shape == (1, 26, 42, 3)
