"""FID/LPIPS structural + numerical tests (pretrained weights unavailable in
this environment; the Frechet math is verified against a closed form)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_inception_block_shapes():
    from basicsr4rs_tpu.archs.inception import InceptionV3
    net = InceptionV3(output_blocks=(0, 1, 2, 3), resize_input=False)
    x = jnp.zeros((1, 299, 299, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    outs = net.apply(params, x)
    chans = [o.shape[-1] for o in outs]
    # the four canonical FID feature widths (reference inception.py:25-30)
    assert chans == [64, 192, 768, 2048]
    assert outs[3].shape == (1, 1, 1, 2048)


def test_calculate_fid_closed_form():
    from basicsr4rs_tpu.metrics import calculate_fid
    rng = np.random.RandomState(0)
    d = 8
    mu1, mu2 = rng.randn(d), rng.randn(d)
    a = rng.randn(d, d)
    sigma = a @ a.T + np.eye(d)
    # identical Gaussians -> 0
    assert abs(calculate_fid(mu1, sigma, mu1.copy(), sigma.copy())) < 1e-6
    # same covariance -> squared mean distance
    got = calculate_fid(mu1, sigma, mu2, sigma.copy())
    np.testing.assert_allclose(got, np.sum((mu1 - mu2)**2), rtol=1e-6, atol=1e-6)
    # diagonal case: d2 = |mu|^2 + sum (s1 + s2 - 2 sqrt(s1 s2))
    s1 = np.diag(rng.rand(d) + 0.5)
    s2 = np.diag(rng.rand(d) + 0.5)
    got = calculate_fid(mu1, s1, mu2, s2)
    want = np.sum((mu1 - mu2)**2) + np.sum(np.diag(s1) + np.diag(s2)
                                           - 2 * np.sqrt(np.diag(s1) * np.diag(s2)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_extract_inception_features_random_params():
    from basicsr4rs_tpu.archs.inception import InceptionV3
    from basicsr4rs_tpu.metrics import extract_inception_features
    net = InceptionV3(output_blocks=(3,), resize_input=False, normalize_input=True)
    x = jnp.zeros((2, 75, 75, 3))
    params = net.init(jax.random.PRNGKey(0), x)['params']
    feats = extract_inception_features([np.zeros((2, 75, 75, 3), np.float32)] * 2,
                                       net, params)
    assert feats.shape == (4, 2048)


def test_lpips_identity_and_symmetry():
    from basicsr4rs_tpu.metrics.lpips import LPIPS
    net = LPIPS()
    a = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32) * 2 - 1)
    b = jnp.asarray(np.random.RandomState(1).rand(1, 32, 32, 3).astype(np.float32) * 2 - 1)
    params = net.init(jax.random.PRNGKey(0), a, b)
    d_aa = float(net.apply(params, a, a)[0])
    d_ab = float(net.apply(params, a, b)[0])
    d_ba = float(net.apply(params, b, a)[0])
    assert abs(d_aa) < 1e-6
    assert d_ab > 0
    np.testing.assert_allclose(d_ab, d_ba, rtol=1e-5)


def test_lpips_gated_without_weights():
    from basicsr4rs_tpu.metrics import calculate_lpips_band, calculate_lpips_none
    assert calculate_lpips_none() == -1
    img = np.zeros((16, 16, 3), np.uint8)
    with pytest.raises(FileNotFoundError):
        calculate_lpips_band(img, img, crop_border=0, band=0)


def test_fid_inception_gated_without_weights():
    from basicsr4rs_tpu.metrics import load_patched_inception_v3
    with pytest.raises(FileNotFoundError):
        load_patched_inception_v3()
