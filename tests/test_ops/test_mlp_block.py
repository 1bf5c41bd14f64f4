"""Fused MLP branch kernel (LN+fc1+GELU+fc2) vs the XLA reference — forward
and full VJP (x, LN affine, both GEMMs), in interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basicsr4rs_tpu.ops.mlp_block import fused_mlp_block, reference_mlp_block


def _case(t=96, c=12, hidden=24, seed=0):
    rng = np.random.RandomState(seed)
    return dict(
        x=jnp.asarray(rng.randn(t, c).astype(np.float32)),
        ln_scale=jnp.asarray(1 + 0.1 * rng.randn(c).astype(np.float32)),
        ln_bias=jnp.asarray(0.1 * rng.randn(c).astype(np.float32)),
        w1=jnp.asarray(rng.randn(c, hidden).astype(np.float32) * 0.2),
        b1=jnp.asarray(0.1 * rng.randn(hidden).astype(np.float32)),
        w2=jnp.asarray(rng.randn(hidden, c).astype(np.float32) * 0.2),
        b2=jnp.asarray(0.1 * rng.randn(c).astype(np.float32)),
    )


ARGNAMES = ('x', 'ln_scale', 'ln_bias', 'w1', 'b1', 'w2', 'b2')


def test_forward_matches_reference():
    kw = _case()
    args = [kw[k] for k in ARGNAMES]
    want = reference_mlp_block(*args)
    got = fused_mlp_block(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_forward_leading_shape():
    """(B, H, W, C) input round-trips through the token flattening."""
    kw = _case(seed=1)
    args = [kw[k] for k in ARGNAMES]
    x4 = args[0].reshape(2, 4, 12, 12)
    want = reference_mlp_block(x4, *args[1:])
    got = fused_mlp_block(x4, *args[1:], interpret=True)
    assert got.shape == x4.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_vjp_matches_reference_grads():
    kw = _case(seed=2)
    args = [kw[k] for k in ARGNAMES]

    def loss_fused(*a):
        out = fused_mlp_block(*a, interpret=True)
        return jnp.sum(out * jnp.sin(out))

    def loss_ref(*a):
        out = reference_mlp_block(*a)
        return jnp.sum(out * jnp.sin(out))

    g_f = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    g_r = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for name, a, b in zip(ARGNAMES, g_f, g_r):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.abs(b).max() + 1e-6
        err = np.abs(a - b).max() / denom
        assert err < 2e-4, f'grad mismatch for {name}: rel-err {err:.2e}'


def test_add_residual_mode():
    """add_residual folds x + branch into the kernel — fwd and dx."""
    kw = _case(seed=4)
    args = [kw[k] for k in ARGNAMES]
    want = kw['x'] + reference_mlp_block(*args)
    got = fused_mlp_block(*args, interpret=True, add_residual=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)

    def loss_fused(x):
        return jnp.sum(fused_mlp_block(x, *args[1:], interpret=True,
                                       add_residual=True) ** 2)

    def loss_ref(x):
        return jnp.sum((x + reference_mlp_block(x, *args[1:])) ** 2)

    np.testing.assert_allclose(np.asarray(jax.grad(loss_fused)(kw['x'])),
                               np.asarray(jax.grad(loss_ref)(kw['x'])),
                               atol=1e-3, rtol=1e-3)


def test_multi_tile_grid():
    """Token count large enough for several grid tiles; weight grads must
    accumulate across tiles."""
    kw = _case(t=4096, c=8, hidden=16, seed=3)
    args = [kw[k] for k in ARGNAMES]
    want = reference_mlp_block(*args)
    got = fused_mlp_block(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)

    def loss_fused(*a):
        return jnp.sum(fused_mlp_block(*a, interpret=True) ** 2)

    def loss_ref(*a):
        return jnp.sum(reference_mlp_block(*a) ** 2)

    gf = jax.grad(loss_fused, argnums=(3, 5))(*args)
    gr = jax.grad(loss_ref, argnums=(3, 5))(*args)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)


def test_residual_scale_mode():
    """x + s*branch with a per-token DropPath scale folded into the kernel —
    values AND grads vs the composed reference, including dropped samples."""
    import numpy as np
    rng = np.random.RandomState(7)
    b, l, c, hidden = 2, 64, 16, 32
    x = jnp.asarray(rng.randn(b, l, c).astype(np.float32))
    lns = jnp.asarray(1 + 0.1 * rng.randn(c).astype(np.float32))
    lnb = jnp.asarray(0.1 * rng.randn(c).astype(np.float32))
    w1 = jnp.asarray(rng.randn(c, hidden).astype(np.float32) * 0.2)
    b1 = jnp.asarray(0.1 * rng.randn(hidden).astype(np.float32))
    w2 = jnp.asarray(rng.randn(hidden, c).astype(np.float32) * 0.2)
    b2 = jnp.asarray(0.1 * rng.randn(c).astype(np.float32))
    s = jnp.asarray(np.array([0.0, 1.0 / 0.9], np.float32))[:, None]  # (b, 1)

    def fused(*a):
        return fused_mlp_block(*a, interpret=True, residual_scale=s)

    def ref(*a):
        out = reference_mlp_block(*a)
        return a[0] + out * s[..., None]

    args = (x, lns, lnb, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(fused(*args)),
                               np.asarray(ref(*args)), atol=2e-5, rtol=1e-4)

    def loss(f):
        def inner(*a):
            out = f(*a)
            return jnp.sum(out * jnp.sin(out))
        return inner

    g_f = jax.grad(loss(fused), argnums=tuple(range(7)))(*args)
    g_r = jax.grad(loss(ref), argnums=tuple(range(7)))(*args)
    for i, (a, bb) in enumerate(zip(g_f, g_r)):
        a, bb = np.asarray(a), np.asarray(bb)
        denom = np.abs(bb).max() + 1e-6
        assert np.abs(a - bb).max() / denom < 2e-4, f'arg {i}'
