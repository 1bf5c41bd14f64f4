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


@pytest.mark.parametrize('upscale', [2, 3, 4])
def test_edsr_parity(upscale):
    from basicsr4rs_tpu.archs.edsr_arch import EDSR
    kwargs = dict(num_in_ch=3, num_out_ch=3, num_feat=16, num_block=2, upscale=upscale,
                  res_scale=1, img_range=255., rgb_mean=(0.4488, 0.4371, 0.4040))
    _run_parity('basicsr/archs/edsr_arch.py', 'EDSR', kwargs,
                EDSR(**{**kwargs, 'rgb_mean': tuple(kwargs['rgb_mean'])}),
                rules=EDSR.TORCH_KEY_RULES, atol=2e-3)  # img_range=255 amplifies fp noise
