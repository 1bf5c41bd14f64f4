"""PerceptualLoss numeric parity vs the reference (basic_loss.py:147-268):
VGG feature taps, input normalization, per-layer weights, l1/fro criteria
and the Gram style term — same (random, seeded) VGG weights on both sides."""

import sys
from os import path as osp

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))
from ref_loader import load_ref_module  # noqa: E402

LAYERS = {'conv2_2': 0.5, 'conv4_4': 1.0}


def _pair():
    import torch
    torch.manual_seed(0)
    vm = load_ref_module('basicsr/archs/vgg_arch.py')
    ref_vgg = vm.VGGFeatureExtractor(layer_name_list=list(LAYERS), vgg_type='vgg19',
                                     use_input_norm=True, range_norm=False).eval()
    # convert the (seeded random) torch weights into our param tree
    params = {}
    for k, v in ref_vgg.state_dict().items():
        if not k.startswith('vgg_net.') or 'conv' not in k:
            continue
        _, name, leaf = k.split('.')
        arr = v.numpy()
        if leaf == 'weight':
            params.setdefault(name, {})['kernel'] = np.transpose(arr, (2, 3, 1, 0))
        else:
            params.setdefault(name, {})['bias'] = arr
    return ref_vgg, params


def test_perceptual_and_style_loss_parity():
    import torch
    ref_vgg, params = _pair()
    lm = load_ref_module('basicsr/losses/basic_loss.py')
    ref_loss = lm.PerceptualLoss(layer_weights=dict(LAYERS), vgg_type='vgg19',
                                 perceptual_weight=1.0, style_weight=2.0,
                                 criterion='l1')
    ref_loss.vgg = ref_vgg  # force the seeded stub weights

    rng = np.random.RandomState(3)
    x = rng.rand(2, 3, 32, 32).astype(np.float32)
    gt = rng.rand(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        want_p, want_s = ref_loss(torch.from_numpy(x), torch.from_numpy(gt))

    from basicsr4rs_tpu.losses.perceptual_loss import PerceptualLoss
    ours = PerceptualLoss(layer_weights=dict(LAYERS), vgg_type='vgg19',
                          perceptual_weight=1.0, style_weight=2.0,
                          criterion='l1', vgg_params=params)
    got_p, got_s = ours(jnp.asarray(x.transpose(0, 2, 3, 1)),
                        jnp.asarray(gt.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(float(got_p), float(want_p), rtol=2e-4)
    np.testing.assert_allclose(float(got_s), float(want_s), rtol=2e-4, atol=1e-9)


def test_perceptual_fro_criterion_parity():
    import torch
    ref_vgg, params = _pair()
    lm = load_ref_module('basicsr/losses/basic_loss.py')
    ref_loss = lm.PerceptualLoss(layer_weights=dict(LAYERS), vgg_type='vgg19',
                                 perceptual_weight=1.0, style_weight=0.,
                                 criterion='fro')
    ref_loss.vgg = ref_vgg

    rng = np.random.RandomState(4)
    x = rng.rand(1, 3, 32, 32).astype(np.float32)
    gt = rng.rand(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        want_p, _ = ref_loss(torch.from_numpy(x), torch.from_numpy(gt))

    from basicsr4rs_tpu.losses.perceptual_loss import PerceptualLoss
    ours = PerceptualLoss(layer_weights=dict(LAYERS), vgg_type='vgg19',
                          perceptual_weight=1.0, style_weight=0.,
                          criterion='fro', vgg_params=params)
    got_p, _ = ours(jnp.asarray(x.transpose(0, 2, 3, 1)),
                    jnp.asarray(gt.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(float(got_p), float(want_p), rtol=2e-4)
