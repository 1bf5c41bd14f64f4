"""Loss tests (reference pattern: tests/test_losses/test_losses.py:7-38)."""

import jax.numpy as jnp
import numpy as np
import pytest

from basicsr4rs_tpu.losses import build_loss
from basicsr4rs_tpu.losses.basic_loss import CharbonnierLoss, L1Loss, MSELoss, WeightedTVLoss
from basicsr4rs_tpu.losses.gan_loss import GANLoss, MultiScaleGANLoss


@pytest.mark.parametrize('cls,expected', [(L1Loss, 0.25), (MSELoss, 0.0625),
                                          (CharbonnierLoss, 0.25)])
def test_pixel_losses(cls, expected):
    pred = jnp.full((2, 4, 4, 3), 0.25)
    target = jnp.zeros((2, 4, 4, 3))
    loss = cls(loss_weight=1.0, reduction='mean')
    assert float(loss(pred, target)) == pytest.approx(expected, abs=1e-6)
    # loss weight scales
    loss2 = cls(loss_weight=2.0, reduction='mean')
    assert float(loss2(pred, target)) == pytest.approx(2 * expected, abs=1e-6)
    # sum reduction
    loss3 = cls(loss_weight=1.0, reduction='sum')
    assert float(loss3(pred, target)) == pytest.approx(expected * 96, rel=1e-5)
    # spatial weight
    w = jnp.zeros((2, 4, 4, 1)).at[:, :2].set(1.0)
    val = float(cls(loss_weight=1.0, reduction='mean')(pred, target, weight=w))
    assert val == pytest.approx(expected, abs=1e-5)


def test_invalid_reduction_raises():
    with pytest.raises(ValueError):
        L1Loss(reduction='avg')


def test_weighted_tv_loss():
    x = jnp.zeros((1, 4, 4, 1)).at[:, 2:].set(1.0)
    val = float(WeightedTVLoss()(x))
    assert val > 0
    flat = jnp.ones((1, 4, 4, 1))
    assert float(WeightedTVLoss()(flat)) == 0


def test_build_loss_registry():
    loss = build_loss({'type': 'L1Loss', 'loss_weight': 0.5})
    assert isinstance(loss, L1Loss) and loss.loss_weight == 0.5


@pytest.mark.parametrize('gan_type', ['vanilla', 'lsgan', 'wgan', 'wgan_softplus', 'hinge'])
def test_gan_loss_types(gan_type):
    loss = GANLoss(gan_type, loss_weight=2.0)
    pred = jnp.asarray(np.random.RandomState(0).randn(4, 1).astype(np.float32))
    for target_real in [True, False]:
        g = float(loss(pred, target_real, is_disc=False))
        d = float(loss(pred, target_real, is_disc=True))
        assert np.isfinite(g) and np.isfinite(d)
    # loss_weight applies only to generator
    raw_d = float(loss(pred, True, is_disc=True))
    raw_g = float(loss(pred, True, is_disc=False))
    base = GANLoss(gan_type, loss_weight=1.0)
    assert raw_d == pytest.approx(float(base(pred, True, is_disc=True)))
    assert raw_g == pytest.approx(2 * float(base(pred, True, is_disc=False)))


def test_gan_loss_vanilla_values():
    # BCE-with-logits at logit 0 is ln(2)
    loss = GANLoss('vanilla')
    assert float(loss(jnp.zeros((2, 1)), True, is_disc=True)) == pytest.approx(np.log(2), abs=1e-6)


def test_multiscale_gan_loss():
    loss = MultiScaleGANLoss('lsgan')
    preds = [jnp.ones((2, 4)), [jnp.zeros((2, 2)), jnp.ones((2, 4)) * 0.5]]
    val = float(loss(preds, True, is_disc=True))
    assert np.isfinite(val)


def test_perceptual_loss_contract():
    from basicsr4rs_tpu.losses.perceptual_loss import PerceptualLoss
    loss = PerceptualLoss(layer_weights={'relu1_2': 1.0, 'relu2_2': 0.5},
                          vgg_type='vgg16', perceptual_weight=1.0, style_weight=0.5)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32))
    gt = jnp.asarray(np.random.RandomState(1).rand(1, 32, 32, 3).astype(np.float32))
    percep, style = loss(x, gt)
    assert percep is not None and float(percep) > 0
    assert style is not None and float(style) >= 0
    p_same, _ = loss(x, x)
    assert float(p_same) == pytest.approx(0.0, abs=1e-6)


def test_ldl_artifact_map():
    from basicsr4rs_tpu.losses.loss_util import get_refined_artifact_map
    rng = np.random.RandomState(0)
    gt = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
    out = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
    ema = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
    m = get_refined_artifact_map(gt, out, ema, ksize=7)
    assert m.shape == (2, 16, 16, 1)
    assert float(jnp.min(m)) >= 0


def test_ldl_artifact_map_matches_torch_reference():
    """Numeric parity with the reference map (loss_util.py:99-145):
    unbiased reflect-padded window variance x (image variance)^(1/5)."""
    import importlib.util
    import sys
    import types
    import torch
    sys.modules.setdefault('basicsr', types.ModuleType('basicsr'))
    spec = importlib.util.spec_from_file_location(
        'ref_loss_util', '/root/reference/basicsr/losses/loss_util.py')
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    from basicsr4rs_tpu.losses.loss_util import get_refined_artifact_map
    rng = np.random.RandomState(1)
    gt = rng.rand(2, 3, 16, 16).astype(np.float32)
    out = rng.rand(2, 3, 16, 16).astype(np.float32)
    ema = rng.rand(2, 3, 16, 16).astype(np.float32)
    want = ref.get_refined_artifact_map(torch.from_numpy(gt), torch.from_numpy(out),
                                        torch.from_numpy(ema), 7).numpy()
    got = np.asarray(get_refined_artifact_map(
        jnp.asarray(gt.transpose(0, 2, 3, 1)), jnp.asarray(out.transpose(0, 2, 3, 1)),
        jnp.asarray(ema.transpose(0, 2, 3, 1)), ksize=7)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-5)
