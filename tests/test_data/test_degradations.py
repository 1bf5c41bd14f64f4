"""Distribution tests for the TPU-native noise synthesis ops.

The branch-free Poisson sampler (`degradations._poisson_tpu`) replaces
``jax.random.poisson`` (rejection sampling, 105.9 ms/call at canvas size on
v5e — scripts/profile_degradation.py). These tests pin its statistical
fidelity: exact pmf in the inversion regime, mean/variance in the
normal-approximation regime, and the end-to-end noise-op contracts that the
reference ``*_pt`` variants guarantee (basicsr/data/degradations.py:544,714).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basicsr4rs_tpu.data.degradations import (_poisson_tpu,
                                              generate_poisson_noise_jax,
                                              random_add_gaussian_noise_jax,
                                              random_add_poisson_noise_jax)


def _sample(lam_value, n=200_000, seed=0):
    lam = jnp.full((n,), lam_value, jnp.float32)
    return np.asarray(_poisson_tpu(jax.random.PRNGKey(seed), lam))


@pytest.mark.parametrize('lam', [0.3, 2.5, 8.0])
def test_poisson_small_lambda_matches_pmf(lam):
    """Inversion regime: empirical pmf matches the analytic Poisson pmf."""
    from scipy import stats
    s = _sample(lam)
    kmax = int(s.max()) + 1
    counts = np.bincount(s.astype(np.int64), minlength=kmax) / s.size
    pmf = stats.poisson.pmf(np.arange(kmax), lam)
    # every bin with non-trivial mass within 4 sigma of its binomial stderr
    stderr = np.sqrt(pmf * (1 - pmf) / s.size)
    mask = pmf > 1e-4
    assert np.all(np.abs(counts[mask] - pmf[mask]) < 4 * stderr[mask] + 1e-4)


@pytest.mark.parametrize('lam', [20.0, 64.0, 220.0])
def test_poisson_large_lambda_moments(lam):
    """Normal regime: mean and variance match Poisson(lam)."""
    s = _sample(lam)
    n = s.size
    assert abs(s.mean() - lam) < 5 * np.sqrt(lam / n)
    assert abs(s.var() / lam - 1.0) < 0.05
    assert np.all(s >= 0)
    assert np.allclose(s, np.round(s))  # integer support


def test_poisson_zero_lambda():
    s = _sample(0.0, n=1000)
    assert np.all(s == 0)


def test_poisson_mixed_lambda_map():
    """Per-element lam (the real use: lam = img * vals)."""
    rs = np.random.RandomState(0)
    lam = jnp.asarray(rs.uniform(0, 256, (100_000,)).astype(np.float32))
    s = np.asarray(_poisson_tpu(jax.random.PRNGKey(3), lam))
    lam_np = np.asarray(lam)
    # aggregated moments: E[X]=E[lam], Var[X]=E[lam]+Var[lam]
    assert abs(s.mean() - lam_np.mean()) < 0.2
    expected_var = lam_np.mean() + lam_np.var()
    assert abs(s.var() / expected_var - 1.0) < 0.05


def test_generate_poisson_noise_gray_vs_color():
    """gray_noise=1 -> identical noise across channels; 0 -> independent."""
    rs = np.random.RandomState(1)
    img = jnp.asarray(rs.rand(2, 16, 16, 3).astype(np.float32))
    key = jax.random.PRNGKey(0)
    scale = jnp.ones((2,), jnp.float32)
    n_gray = np.asarray(generate_poisson_noise_jax(key, img, scale, jnp.ones((2,))))
    n_col = np.asarray(generate_poisson_noise_jax(key, img, scale, jnp.zeros((2,))))
    assert np.allclose(n_gray[..., 0], n_gray[..., 1])
    assert not np.allclose(n_col[..., 0], n_col[..., 1])


def test_random_add_poisson_noise_clips():
    rs = np.random.RandomState(2)
    img = jnp.asarray(rs.rand(2, 16, 16, 3).astype(np.float32))
    out = np.asarray(random_add_poisson_noise_jax(
        jax.random.PRNGKey(0), img, scale_range=(1.0, 3.0), gray_prob=0.5,
        clip=True))
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert not np.allclose(out, np.asarray(img))  # noise actually applied


def test_random_add_gaussian_noise_sigma_range():
    """Noise std lands inside sigma_range/255 (reference convention)."""
    img = jnp.full((4, 64, 64, 3), 0.5, jnp.float32)
    out = np.asarray(random_add_gaussian_noise_jax(
        jax.random.PRNGKey(0), img, sigma_range=(10, 10), gray_prob=0.,
        clip=False))
    assert abs((out - 0.5).std() - 10 / 255.) < 1e-3
