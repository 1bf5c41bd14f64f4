"""GAN regularizer parity vs the reference formulas (gan_loss.py:143-207),
checked with analytic networks both frameworks can autodiff and with the
internal randomness pinned to identical values on both sides."""

import importlib.util
import sys
import types
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np


def _load_ref_gan_loss():
    sys.modules.setdefault('basicsr', types.ModuleType('basicsr'))
    utils = types.ModuleType('basicsr.utils')
    registry = types.ModuleType('basicsr.utils.registry')

    class _Reg:
        def register(self, *a, **k):
            return lambda cls: cls

    registry.LOSS_REGISTRY = _Reg()
    utils.registry = registry
    sys.modules.setdefault('basicsr.utils', utils)
    sys.modules.setdefault('basicsr.utils.registry', registry)
    spec = importlib.util.spec_from_file_location(
        'ref_gan_loss', '/root/reference/basicsr/losses/gan_loss.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_gan_loss_all_types_match_torch():
    """Every gan_type x target x is_disc combination equals the reference
    (gan_loss.py:11-113), incl. the loss_weight-only-for-G rule."""
    import torch
    ref_mod = _load_ref_gan_loss()
    from basicsr4rs_tpu.losses.gan_loss import GANLoss
    rng = np.random.RandomState(0)
    x = (rng.randn(4, 6, 6, 1) * 2).astype(np.float32)
    xt = torch.from_numpy(x)
    for t in ['vanilla', 'lsgan', 'wgan', 'wgan_softplus', 'hinge']:
        ref = ref_mod.GANLoss(t, loss_weight=0.7)
        ours = GANLoss(t, loss_weight=0.7)
        for target in (True, False):
            for is_disc in (True, False):
                want = float(ref(xt, target, is_disc=is_disc).detach())
                got = float(ours(jnp.asarray(x), target, is_disc=is_disc))
                np.testing.assert_allclose(
                    got, want, rtol=1e-5, atol=1e-6,
                    err_msg=f'{t} target={target} is_disc={is_disc}')


def test_r1_penalty_parity():
    import torch
    ref = _load_ref_gan_loss()
    rng = np.random.RandomState(0)
    x = rng.rand(3, 3, 8, 8).astype(np.float32)

    x_t = torch.from_numpy(x).requires_grad_(True)
    real_pred = (x_t ** 3 + 0.5 * x_t).sum(dim=(1, 2, 3))
    want = float(ref.r1_penalty(real_pred, x_t).detach())

    from basicsr4rs_tpu.losses.gan_loss import r1_penalty
    d_fn = lambda v: jnp.sum(v ** 3 + 0.5 * v, axis=(1, 2, 3))  # noqa: E731
    got = float(r1_penalty(d_fn, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_g_path_regularize_parity():
    import torch
    ref = _load_ref_gan_loss()
    rng = np.random.RandomState(1)
    n, num_lat, lat_dim, c, h, w = 2, 4, 8, 3, 8, 8
    lat = rng.rand(n, num_lat, lat_dim).astype(np.float32)
    proj = rng.rand(lat_dim, c * h * w).astype(np.float32)
    noise = rng.randn(n, c, h, w).astype(np.float32)  # RAW: both sides divide by sqrt(h*w)

    lat_t = torch.from_numpy(lat).requires_grad_(True)
    fake_t = (lat_t.sum(1) @ torch.from_numpy(proj)).reshape(n, c, h, w) ** 2
    with mock.patch('torch.randn_like', lambda t: torch.from_numpy(noise)):
        want_pen, want_lens, want_mean = (t.detach() for t in ref.g_path_regularize(fake_t, lat_t, 0.0))

    from basicsr4rs_tpu.losses import gan_loss as gl

    def fake_fn(z):
        img = (jnp.sum(z, axis=1) @ jnp.asarray(proj)).reshape(n, c, h, w) ** 2
        return jnp.transpose(img, (0, 2, 3, 1))  # NHWC like our generators

    noise_nhwc = jnp.asarray(noise.transpose(0, 2, 3, 1))
    with mock.patch.object(gl.jax.random, 'normal', lambda key, shape: noise_nhwc):
        got_pen, got_lens, got_mean = gl.g_path_regularize(
            fake_fn, jnp.asarray(lat), 0.0, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(got_pen), float(want_pen), rtol=1e-5)
    np.testing.assert_allclose(float(jnp.mean(got_lens)), float(want_lens), rtol=1e-5)
    np.testing.assert_allclose(float(got_mean), float(want_mean), rtol=1e-5)


def test_gradient_penalty_parity():
    """The reference norms gradients over the CHANNEL dim only
    (gan_loss.py:203) — pin that exact convention."""
    import torch
    ref = _load_ref_gan_loss()
    rng = np.random.RandomState(2)
    real = rng.rand(3, 3, 8, 8).astype(np.float32)
    fake = rng.rand(3, 3, 8, 8).astype(np.float32)
    alpha = rng.rand(3, 1, 1, 1).astype(np.float32)

    class D(torch.nn.Module):
        def forward(self, v):
            return (v ** 3 + 0.5 * v).sum(dim=(1, 2, 3))

    import warnings
    with mock.patch('torch.rand', lambda *a, **k: torch.from_numpy(alpha)), \
            warnings.catch_warnings():
        warnings.simplefilter('ignore', UserWarning)  # new_tensor copy notice
        want = float(ref.gradient_penalty_loss(D(), torch.from_numpy(real),
                                               torch.from_numpy(fake)).detach())

    from basicsr4rs_tpu.losses import gan_loss as gl
    d_fn = lambda v: jnp.sum(v ** 3 + 0.5 * v, axis=(1, 2, 3))  # noqa: E731
    with mock.patch.object(gl.jax.random, 'uniform',
                           lambda key, shape: jnp.asarray(alpha)):
        got = float(gl.gradient_penalty_loss(
            d_fn, jnp.asarray(real.transpose(0, 2, 3, 1)),
            jnp.asarray(fake.transpose(0, 2, 3, 1)), jax.random.PRNGKey(0)))
    np.testing.assert_allclose(got, want, rtol=1e-5)
