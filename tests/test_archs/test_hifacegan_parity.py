"""Torch parity for the HiFaceGAN generator/discriminator.

Spectral-norm caveat: torch keeps a running 1-step power-iteration estimate
of sigma; our kernel recomputes 15 steps from a deterministic start. We
therefore run the torch net forward a number of times in train mode first so
its u/v buffers converge to the true leading singular vectors, then compare
in eval mode with a loose-but-meaningful tolerance.
"""

import sys
from os import path as osp

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
from ref_loader import load_ref_module  # noqa: E402

from basicsr4rs_tpu.utils.torch_convert import convert_torch_state_dict  # noqa: E402


def _converge_sn(ref_net, x, n=80):
    import torch
    torch.manual_seed(0)
    ref_net.train()
    with torch.no_grad():
        for _ in range(n):
            ref_net(x)
    ref_net.eval()


def test_spade_generator_parity_no_sn():
    """Non-spectral config is exact (reference hifacegan_arch.py:10-95)."""
    import torch
    torch.manual_seed(0)
    from basicsr4rs_tpu.archs.hifacegan_arch import SPADEGenerator
    ref_mod = load_ref_module('basicsr/archs/hifacegan_arch.py')
    kwargs = dict(num_in_ch=3, num_feat=4, crop_size=64, norm_g='spadeinstance3x3')
    ref_net = ref_mod.SPADEGenerator(**kwargs).eval()
    x = np.random.RandomState(0).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_net(torch.from_numpy(x)).numpy()

    params = convert_torch_state_dict(ref_net.state_dict())
    mine = SPADEGenerator(**kwargs)
    out = mine.apply({'params': params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    out = np.asarray(out).transpose(0, 3, 1, 2)
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, atol=2e-5, rtol=1e-4)


def test_hifacegan_parity_sn():
    """Full HiFaceGAN (LIP encoder + spectral SPADE blocks)."""
    import torch
    torch.manual_seed(0)
    from basicsr4rs_tpu.archs.hifacegan_arch import HiFaceGAN
    ref_mod = load_ref_module('basicsr/archs/hifacegan_arch.py')
    kwargs = dict(num_in_ch=3, num_feat=4, crop_size=64)
    ref_net = ref_mod.HiFaceGAN(**kwargs)
    x_t = torch.from_numpy(np.random.RandomState(0).rand(1, 3, 64, 64).astype(np.float32))
    _converge_sn(ref_net, x_t)
    with torch.no_grad():
        ref_out = ref_net(x_t).numpy()

    params = convert_torch_state_dict(ref_net.state_dict(), rules=HiFaceGAN.TORCH_KEY_RULES)
    mine = HiFaceGAN(**kwargs)
    out = mine.apply({'params': params}, jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1)))
    out = np.asarray(out).transpose(0, 3, 1, 2)
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, atol=2e-3, rtol=1e-2)


def test_hifacegan_discriminator_parity():
    import torch
    torch.manual_seed(0)
    from basicsr4rs_tpu.archs.hifacegan_arch import HiFaceGANDiscriminator
    ref_mod = load_ref_module('basicsr/archs/hifacegan_arch.py')
    kwargs = dict(num_in_ch=3, num_out_ch=3, num_d=2, n_layers_d=4, num_feat=8)
    ref_net = ref_mod.HiFaceGANDiscriminator(**kwargs)
    x_t = torch.from_numpy(np.random.RandomState(1).rand(1, 6, 64, 64).astype(np.float32))
    _converge_sn(ref_net, x_t)
    with torch.no_grad():
        ref_out = ref_net(x_t)

    params = convert_torch_state_dict(ref_net.state_dict())
    mine = HiFaceGANDiscriminator(**kwargs)
    out = mine.apply({'params': params}, jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1)))
    assert len(out) == len(ref_out) == 2
    for scale_mine, scale_ref in zip(out, ref_out):
        assert len(scale_mine) == len(scale_ref)
        for t_mine, t_ref in zip(scale_mine, scale_ref):
            got = np.asarray(t_mine).transpose(0, 3, 1, 2)
            np.testing.assert_allclose(got, t_ref.numpy(), atol=2e-3, rtol=1e-2)


def test_unet_discriminator_sn_parity():
    """Real-ESRGAN U-Net discriminator (spectral norm) vs torch."""
    import torch
    torch.manual_seed(0)
    from basicsr4rs_tpu.archs.discriminator_arch import UNetDiscriminatorSN
    ref_mod = load_ref_module('basicsr/archs/discriminator_arch.py')
    ref_net = ref_mod.UNetDiscriminatorSN(num_in_ch=3, num_feat=8, skip_connection=True)
    x_t = torch.from_numpy(np.random.RandomState(0).rand(1, 3, 64, 64).astype(np.float32))
    _converge_sn(ref_net, x_t)
    with torch.no_grad():
        want = ref_net(x_t).numpy()
    mine = UNetDiscriminatorSN(num_in_ch=3, num_feat=8, skip_connection=True)
    params = convert_torch_state_dict(ref_net.state_dict(),
                                      rules=getattr(UNetDiscriminatorSN, 'TORCH_KEY_RULES', None))
    got = mine.apply({'params': params}, jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1)))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-2)
