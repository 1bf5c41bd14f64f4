"""Forward-parity tests: random-init reference torch archs -> convert weights
-> our NHWC flax archs must produce the same outputs (the checkpoint-
conversion contract, SURVEY.md §7 hard-part 6)."""

import sys
from os import path as osp

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))
from ref_loader import load_ref_module  # noqa: E402

from basicsr4rs_tpu.utils.torch_convert import convert_torch_state_dict  # noqa: E402


def _run_parity(ref_mod_path, ref_cls_name, ref_kwargs, my_module, rules=None,
                in_shape=(1, 3, 16, 16), atol=2e-5):
    import torch
    ref_mod = load_ref_module(ref_mod_path)
    ref_net = getattr(ref_mod, ref_cls_name)(**ref_kwargs).eval()
    x = np.random.RandomState(0).rand(*in_shape).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_net(torch.from_numpy(x)).numpy()

    params = convert_torch_state_dict(ref_net.state_dict(), rules=rules)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    my_out = my_module.apply({'params': params}, x_nhwc)
    my_out = np.asarray(my_out).transpose(0, 3, 1, 2)

    assert my_out.shape == ref_out.shape
    np.testing.assert_allclose(my_out, ref_out, atol=atol, rtol=1e-4)


def test_msrresnet_parity():
    from basicsr4rs_tpu.archs.srresnet_arch import MSRResNet
    _run_parity('basicsr/archs/srresnet_arch.py', 'MSRResNet',
                dict(num_in_ch=3, num_out_ch=3, num_feat=16, num_block=2, upscale=4),
                MSRResNet(num_in_ch=3, num_out_ch=3, num_feat=16, num_block=2, upscale=4))


def test_msrresnet_x2_parity():
    from basicsr4rs_tpu.archs.srresnet_arch import MSRResNet
    _run_parity('basicsr/archs/srresnet_arch.py', 'MSRResNet',
                dict(num_in_ch=3, num_out_ch=3, num_feat=8, num_block=1, upscale=2),
                MSRResNet(num_in_ch=3, num_out_ch=3, num_feat=8, num_block=1, upscale=2))


def test_rcan_parity():
    from basicsr4rs_tpu.archs.rcan_arch import RCAN
    kwargs = dict(num_in_ch=3, num_out_ch=3, num_feat=16, num_group=2, num_block=2,
                  squeeze_factor=4, upscale=4, res_scale=1, img_range=255.)
    _run_parity('basicsr/archs/rcan_arch.py', 'RCAN', kwargs, RCAN(**kwargs),
                rules=RCAN.TORCH_KEY_RULES, atol=2e-3)


def test_srcnn_parity():
    from basicsr4rs_tpu.archs.srcnn_arch import SRCNN
    kwargs = dict(num_in_ch=3, num_out_ch=3, upscale=3)
    _run_parity('basicsr/archs/srcnn_arch.py', 'SRCNN', kwargs, SRCNN(**kwargs), atol=1e-4)


@pytest.mark.parametrize('scale', [1, 2, 4])
def test_rrdbnet_parity(scale):
    from basicsr4rs_tpu.archs.rrdbnet_arch import RRDBNet
    kwargs = dict(num_in_ch=3, num_out_ch=3, scale=scale, num_feat=16, num_block=2, num_grow_ch=8)
    _run_parity('basicsr/archs/rrdbnet_arch.py', 'RRDBNet', kwargs, RRDBNet(**kwargs),
                in_shape=(1, 3, 16, 16), atol=1e-4)


@pytest.mark.parametrize('act_type', ['prelu', 'relu', 'leakyrelu'])
def test_srvgg_parity(act_type):
    from basicsr4rs_tpu.archs.srvgg_arch import SRVGGNetCompact
    kwargs = dict(num_in_ch=3, num_out_ch=3, num_feat=16, num_conv=2, upscale=4, act_type=act_type)
    _run_parity('basicsr/archs/srvgg_arch.py', 'SRVGGNetCompact', kwargs,
                SRVGGNetCompact(**kwargs), atol=1e-4)


def test_ecbsr_parity():
    import torch
    from basicsr4rs_tpu.archs.ecbsr_arch import ECBSR
    ref_mod = load_ref_module('basicsr/archs/ecbsr_arch.py')
    kwargs = dict(num_in_ch=3, num_out_ch=3, num_block=2, num_channel=8, with_idt=True,
                  act_type='prelu', scale=2)
    ref_net = ref_mod.ECBSR(**kwargs).train()  # training mode = branch-sum forward
    x = np.random.RandomState(0).rand(1, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_net(torch.from_numpy(x)).numpy()
    from basicsr4rs_tpu.utils.torch_convert import convert_torch_state_dict
    params = convert_torch_state_dict(ref_net.state_dict())
    my_out = ECBSR(**kwargs).apply({'params': params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(my_out).transpose(0, 3, 1, 2), ref_out, atol=2e-5, rtol=1e-4)


def test_ecb_rep_params_equivalence():
    """Fused 3x3 conv == training-mode branch sum (the deploy contract)."""
    import jax
    from basicsr4rs_tpu.archs.ecbsr_arch import ECB, ecb_rep_params, _conv
    ecb = ECB(in_channels=8, out_channels=8, depth_multiplier=2.0, act_type='linear', with_idt=True)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 12, 12, 8).astype(np.float32))
    params = ecb.init(jax.random.PRNGKey(0), x)['params']
    train_out = ecb.apply({'params': params}, x)
    w, b = ecb_rep_params(params, 8, 8, True)
    fused = _conv(jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))), w, b)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(train_out), atol=1e-5)


def test_ridnet_parity():
    from basicsr4rs_tpu.archs.ridnet_arch import RIDNet
    kwargs = dict(in_channels=3, mid_channels=16, out_channels=3, num_block=2)
    _run_parity('basicsr/archs/ridnet_arch.py', 'RIDNet', kwargs, RIDNet(**kwargs),
                rules=RIDNet.TORCH_KEY_RULES,
                in_shape=(1, 3, 20, 20), atol=2e-3)  # img_range 255 amplifies fp noise


@pytest.mark.parametrize('upscale', [2, 3, 4])
def test_edsr_parity(upscale):
    from basicsr4rs_tpu.archs.edsr_arch import EDSR
    kwargs = dict(num_in_ch=3, num_out_ch=3, num_feat=16, num_block=2, upscale=upscale,
                  res_scale=1, img_range=255., rgb_mean=(0.4488, 0.4371, 0.4040))
    _run_parity('basicsr/archs/edsr_arch.py', 'EDSR', kwargs,
                EDSR(**{**kwargs, 'rgb_mean': tuple(kwargs['rgb_mean'])}),
                rules=EDSR.TORCH_KEY_RULES, atol=2e-3)  # img_range=255 amplifies fp noise
