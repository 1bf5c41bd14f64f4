"""Torch parity for DFDNet (dictionary face restoration)."""

import sys
from os import path as osp

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
from ref_loader import load_ref_module  # noqa: E402

from basicsr4rs_tpu.utils.torch_convert import convert_torch_state_dict  # noqa: E402


def _fake_dict(tmp_path):
    import torch
    torch.manual_seed(0)
    g = torch.Generator().manual_seed(0)
    sizes = {256: (128, 9), 128: (256, 7), 64: (512, 5), 32: (512, 3)}
    parts = ['left_eye', 'right_eye', 'nose', 'mouth']
    d = {}
    for f_size, (ch, k) in sizes.items():
        d[f'{f_size}'] = {p: torch.randn(3, ch, k, k, generator=g) for p in parts}
    path = str(tmp_path / 'dict.pth')
    torch.save(d, path)
    return path


def test_dfdnet_parity(tmp_path):
    import torch
    torch.manual_seed(0)
    from basicsr4rs_tpu.archs.dfdnet_arch import DFDNet, load_dfdnet_dict
    ref_mod = load_ref_module('basicsr/archs/dfdnet_arch.py')
    dict_path = _fake_dict(tmp_path)
    ref_net = ref_mod.DFDNet(num_feat=64, dict_path=dict_path)
    # converge the spectral-norm u/v buffers, then eval
    x_t = torch.from_numpy(
        (np.random.RandomState(0).rand(1, 3, 512, 512).astype(np.float32) * 2 - 1))
    locs = [torch.tensor([[120., 150., 200., 230.]]),
            torch.tensor([[300., 150., 380., 230.]]),
            torch.tensor([[220., 240., 290., 320.]]),
            torch.tensor([[200., 340., 310., 420.]])]
    ref_net.train()
    with torch.no_grad():
        for _ in range(60):
            ref_net(x_t, locs)
    ref_net.eval()
    with torch.no_grad():
        ref_out = ref_net(x_t, locs).numpy()

    params = convert_torch_state_dict(ref_net.state_dict(), rules=DFDNet.TORCH_KEY_RULES)
    mine = DFDNet(num_feat=64)
    dictionary = load_dfdnet_dict(dict_path)
    out = mine.apply({'params': params}, jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1)),
                     [np.asarray(loc) for loc in locs], dictionary)
    out = np.asarray(out).transpose(0, 3, 1, 2)
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, atol=5e-3, rtol=1e-2)
