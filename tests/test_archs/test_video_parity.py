"""Video arch parity/contract tests: SpyNet & BasicVSR forward-parity vs the
reference torch code; EDVR/IconVSR shape contracts (the reference's CUDA DCN
cannot run here — our DCN is anchored analytically in tests/test_ops)."""

import sys
from os import path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))
from ref_loader import load_ref_module  # noqa: E402

from basicsr4rs_tpu.utils.torch_convert import convert_torch_state_dict  # noqa: E402


def test_spynet_parity():
    import torch
    ref_mod = load_ref_module('basicsr/archs/spynet_arch.py')
    ref_net = ref_mod.SpyNet(load_path=None).eval()
    rng = np.random.RandomState(0)
    a = rng.rand(1, 3, 36, 44).astype(np.float32)  # non-32-multiple
    c = rng.rand(1, 3, 36, 44).astype(np.float32)
    with torch.no_grad():
        ref_flow = ref_net(torch.from_numpy(a), torch.from_numpy(c)).numpy()

    from basicsr4rs_tpu.archs.spynet_arch import SpyNet
    params = convert_torch_state_dict(ref_net.state_dict())
    params.pop('mean', None)
    params.pop('std', None)
    mine = SpyNet().apply({'params': params}, jnp.asarray(a.transpose(0, 2, 3, 1)),
                          jnp.asarray(c.transpose(0, 2, 3, 1)))
    mine = np.asarray(mine).transpose(0, 3, 1, 2)
    assert mine.shape == ref_flow.shape
    np.testing.assert_allclose(mine, ref_flow, atol=1e-4, rtol=1e-3)


def test_basicvsr_parity():
    import torch
    ref_mod = load_ref_module('basicsr/archs/basicvsr_arch.py')
    ref_net = ref_mod.BasicVSR(num_feat=8, num_block=1).eval()
    rng = np.random.RandomState(1)
    # >= 36px so the reference SpyNet's 6-level pyramid stays non-degenerate
    x = rng.rand(1, 3, 3, 36, 36).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_net(torch.from_numpy(x)).numpy()

    from basicsr4rs_tpu.archs.basicvsr_arch import BasicVSR
    sd = {k: v for k, v in ref_net.state_dict().items()
          if not k.endswith(('spynet.mean', 'spynet.std'))}
    params = convert_torch_state_dict(sd)
    mine = BasicVSR(num_feat=8, num_block=1).apply(
        {'params': params}, jnp.asarray(x.transpose(0, 1, 3, 4, 2)))
    mine = np.asarray(mine).transpose(0, 1, 4, 2, 3)
    assert mine.shape == ref_out.shape
    np.testing.assert_allclose(mine, ref_out, atol=5e-4, rtol=1e-3)


def test_tsa_fusion_parity():
    import torch
    ref_mod = load_ref_module('basicsr/archs/edvr_arch.py')
    ref = ref_mod.TSAFusion(num_feat=8, num_frame=5, center_frame_idx=2).eval()
    rng = np.random.RandomState(2)
    x = rng.rand(2, 5, 8, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()
    from basicsr4rs_tpu.archs.edvr_arch import TSAFusion
    params = convert_torch_state_dict(ref.state_dict())
    mine = TSAFusion(num_feat=8, num_frame=5, center_frame_idx=2).apply(
        {'params': params}, jnp.asarray(x.transpose(0, 1, 3, 4, 2)))
    np.testing.assert_allclose(np.asarray(mine).transpose(0, 3, 1, 2), ref_out,
                               atol=1e-4, rtol=1e-3)


def test_edvr_shape_contract():
    from basicsr4rs_tpu.archs.edvr_arch import EDVR
    net = EDVR(num_feat=8, num_frame=5, deformable_groups=2, num_extract_block=1,
               num_reconstruct_block=1)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 5, 16, 16, 3).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x)['params']
    out = net.apply({'params': params}, x)
    assert out.shape == (1, 64, 64, 3)
    # key param names match the reference layout
    assert 'pcd_align' in params and 'dcn_pack_l3' in params['pcd_align']
    assert 'conv_offset' in params['pcd_align']['dcn_pack_l3']
    assert 'fusion' in params and 'temporal_attn1' in params['fusion']


def test_edvr_with_predeblur_hr():
    from basicsr4rs_tpu.archs.edvr_arch import EDVR
    net = EDVR(num_feat=8, num_frame=3, deformable_groups=2, num_extract_block=1,
               num_reconstruct_block=1, center_frame_idx=1, hr_in=True, with_predeblur=True,
               with_tsa=False)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 3, 32, 32, 3).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x)['params']
    out = net.apply({'params': params}, x)
    assert out.shape == (1, 32, 32, 3)


def test_iconvsr_shape_contract():
    from basicsr4rs_tpu.archs.basicvsr_arch import IconVSR
    net = IconVSR(num_feat=8, num_block=1, keyframe_stride=3, temporal_padding=2)
    # non-4-multiple spatial size exercises pad_spatial; >=36px keeps the
    # SpyNet pyramid non-degenerate
    x = jnp.asarray(np.random.RandomState(0).rand(1, 5, 38, 42, 3).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x)['params']
    out = net.apply({'params': params}, x)
    assert out.shape == (1, 5, 152, 168, 3)  # padded internally, cropped back


def test_basicvsrpp_shape_contract():
    from basicsr4rs_tpu.archs.basicvsrpp_arch import BasicVSRPlusPlus
    net = BasicVSRPlusPlus(mid_channels=8, num_blocks=1)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 4, 64, 64, 3).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x)['params']
    out = net.apply({'params': params}, x)
    assert out.shape == (1, 4, 256, 256, 3)
    assert 'prop_backward_1' in params
    assert 'conv_offset_6' in params['prop_backward_1']['deform_align']


def _flax_shapes(tree, pre=''):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flax_shapes(v, pre + k + '/'))
        else:
            out[pre + k] = tuple(v.shape)
    return out


def test_iconvsr_torch_key_conversion():
    """The reference IconVSR can't run forward here (CUDA DCN; its CPU
    build even drops the DCN pack weights from the PCD), but its REAL
    state_dict pins our TORCH_KEY_RULES: conversion must produce exactly
    our init param tree — keys AND shapes — minus only the dcnpack
    subtrees, including the PCD ModuleDict levels and the scan-scoped
    trunk/fusion."""
    ref_mod = load_ref_module('basicsr/archs/basicvsr_arch.py')
    ref_net = ref_mod.IconVSR(num_feat=8, num_block=1, keyframe_stride=3,
                              temporal_padding=2)
    sd = {k: v for k, v in ref_net.state_dict().items()
          if not k.endswith(('spynet.mean', 'spynet.std'))}

    from basicsr4rs_tpu.archs.basicvsr_arch import IconVSR
    params = convert_torch_state_dict(sd, rules=IconVSR.TORCH_KEY_RULES)
    net = IconVSR(num_feat=8, num_block=1, keyframe_stride=3, temporal_padding=2)
    x = jnp.zeros((1, 5, 64, 64, 3), jnp.float32)
    init_p = net.init(jax.random.PRNGKey(0), x)['params']
    got, want = _flax_shapes(params), _flax_shapes(init_p)
    missing = {k for k in want if k not in got}
    assert all('dcnpack' in k or 'dcn_pack' in k for k in missing), sorted(missing)[:8]
    covered = {k: v for k, v in want.items() if k in got}
    assert got == covered, (sorted(set(got) - set(want))[:5],
                            [k for k in got if got[k] != covered.get(k)][:5])


def test_iconvsr_scan_golden():
    """Regression anchor for the scan-lifted IconVSR propagation. The scan
    form matched the deleted unrolled implementation to 2.4e-7 when it
    landed; these goldens (same seeds, current impl) guard the scan's flow
    padding, keyframe index mapping, masked refill and reverse-output
    ordering — bugs there shift outputs by orders of magnitude more than
    the tolerance."""
    from basicsr4rs_tpu.archs.basicvsr_arch import IconVSR
    net = IconVSR(num_feat=8, num_block=1, keyframe_stride=3, temporal_padding=2)
    x = np.random.RandomState(0).rand(2, 7, 64, 64, 3).astype(np.float32)
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(x))['params']
    out = np.asarray(net.apply({'params': params}, jnp.asarray(x)))
    assert out.shape == (2, 7, 256, 256, 3)
    np.testing.assert_allclose(float(out.mean()), 0.551104724407196, atol=2e-5)
    np.testing.assert_allclose(
        out[1, 3, 100:103, 200:203, 1],
        np.array([[0.49499154, 0.58380121, 0.59459311],
                  [0.50894070, 0.50559217, 0.56236583],
                  [0.35540402, 0.47099897, 0.47785401]], np.float32),
        atol=1e-4)


def test_basicvsrpp_torch_key_conversion():
    """BasicVSR++'s reference CPU build warns and SKIPS the deform_align
    modules, so its state_dict must convert to exactly our tree minus the
    prop_*/deform_align subtrees."""
    import warnings
    ref_mod = load_ref_module('basicsr/archs/basicvsrpp_arch.py')
    with warnings.catch_warnings():
        warnings.simplefilter('ignore', UserWarning)  # its no-CUDA-DCN warning
        ref_net = ref_mod.BasicVSRPlusPlus(mid_channels=8, num_blocks=1)
    sd = {k: v for k, v in ref_net.state_dict().items()
          if not k.endswith(('spynet.mean', 'spynet.std'))}

    from basicsr4rs_tpu.archs.basicvsrpp_arch import BasicVSRPlusPlus
    params = convert_torch_state_dict(sd, rules=BasicVSRPlusPlus.TORCH_KEY_RULES)
    net = BasicVSRPlusPlus(mid_channels=8, num_blocks=1)
    x = jnp.zeros((1, 3, 64, 64, 3), jnp.float32)
    init_p = net.init(jax.random.PRNGKey(0), x)['params']
    got, want = _flax_shapes(params), _flax_shapes(init_p)
    missing = {k for k in want if k not in got}
    assert all('/deform_align/' in k for k in missing), sorted(missing)[:8]
    covered = {k: v for k, v in want.items() if k in got}
    assert got == covered, (sorted(set(got) - set(want))[:5],
                            [k for k in got if got[k] != covered.get(k)][:5])


def test_duf_parity():
    import torch
    ref_mod = load_ref_module('basicsr/archs/duf_arch.py')
    ref = ref_mod.DUF(scale=4, num_layer=16).eval()
    rng = np.random.RandomState(3)
    x = rng.rand(1, 7, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()
    from basicsr4rs_tpu.archs.duf_arch import DUF
    from basicsr4rs_tpu.models.base_model import _unflatten_dict, _flatten_dict
    sd = ref.state_dict()
    params_all = convert_torch_state_dict(
        {k: v for k, v in sd.items() if 'running' not in k and 'num_batches' not in k},
        rules=DUF.TORCH_KEY_RULES)
    stats = convert_torch_state_dict(
        {k.replace('running_mean', 'mean').replace('running_var', 'var'): v
         for k, v in sd.items() if 'running' in k}, rules=DUF.TORCH_KEY_RULES)
    # expansion_filter buffer is a code constant here
    params_all.pop('dynamic_filter', None)
    mine = DUF(scale=4, num_layer=16).apply(
        {'params': params_all, 'batch_stats': stats},
        jnp.asarray(x.transpose(0, 1, 3, 4, 2)), train=False)
    np.testing.assert_allclose(np.asarray(mine).transpose(0, 3, 1, 2), ref_out,
                               atol=1e-4, rtol=1e-3)


def test_tof_parity():
    import torch
    ref_mod = load_ref_module('basicsr/archs/tof_arch.py')
    ref = ref_mod.TOFlow().eval()
    rng = np.random.RandomState(4)
    x = rng.rand(1, 7, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()
    from basicsr4rs_tpu.archs.tof_arch import TOFlow
    sd = {k: v for k, v in ref.state_dict().items()
          if k not in ('mean', 'std') and 'num_batches' not in k}
    params_all = convert_torch_state_dict(
        {k: v for k, v in sd.items() if 'running' not in k}, rules=TOFlow.TORCH_KEY_RULES)
    stats = convert_torch_state_dict(
        {k.replace('running_mean', 'mean').replace('running_var', 'var'): v
         for k, v in sd.items() if 'running' in k}, rules=TOFlow.TORCH_KEY_RULES)
    mine = TOFlow().apply({'params': params_all, 'batch_stats': stats},
                          jnp.asarray(x.transpose(0, 1, 3, 4, 2)), train=False)
    np.testing.assert_allclose(np.asarray(mine).transpose(0, 3, 1, 2), ref_out,
                               atol=1e-4, rtol=1e-3)
