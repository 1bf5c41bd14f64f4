"""Fused window attention: kernel (interpret mode) vs XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np

from basicsr4rs_tpu.ops.window_attention import (fused_window_attention,
                                                 reference_window_attention)


def _case(b=2, h=16, w=16, c=12, heads=3, ws=4, nwb=1, seed=0):
    rng = np.random.RandomState(seed)
    qkv = jnp.asarray(rng.randn(b, h, w, 3 * c).astype(np.float32))
    n = ws * ws
    bias = jnp.asarray(rng.randn(nwb, heads, n, n).astype(np.float32))
    return qkv, bias


def test_fused_matches_reference_broadcast_bias():
    qkv, bias = _case()
    scale = (12 // 3) ** -0.5
    want = reference_window_attention(qkv, bias, 4, 3, scale)
    got = fused_window_attention(qkv, bias, 4, 3, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_fused_matches_reference_per_window_bias():
    # nWb = number of windows per image (shift-mask case)
    qkv, bias = _case(nwb=16, seed=1)
    scale = 0.3
    want = reference_window_attention(qkv, bias, 4, 3, scale)
    got = fused_window_attention(qkv, bias, 4, 3, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_reference_matches_module_path():
    """reference_window_attention agrees with the WindowAttention module math."""
    from basicsr4rs_tpu.archs.swinir_arch import (SwinIR, window_partition)  # noqa: F401
    b, h, w, c, heads, ws = 1, 8, 8, 6, 2, 4
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    wq = jnp.asarray(rng.randn(c, 3 * c).astype(np.float32))
    qkv = x @ wq
    n = ws * ws
    bias = jnp.zeros((1, heads, n, n), jnp.float32)
    scale = (c // heads) ** -0.5
    out = reference_window_attention(qkv, bias, ws, heads, scale)
    # manual per-window computation
    xw = np.asarray(window_partition(qkv, ws)).reshape(-1, n, 3 * c)
    q, k, v = np.split(xw.reshape(-1, n, 3, heads, c // heads), 3, axis=2)
    q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
    attn = np.einsum('nqhc,nkhc->nhqk', q * scale, k)
    attn = np.exp(attn - attn.max(-1, keepdims=True))
    attn = attn / attn.sum(-1, keepdims=True)
    o = np.einsum('nhqk,nkhc->nqhc', attn, v).reshape(-1, n, c)
    from basicsr4rs_tpu.archs.swinir_arch import window_reverse
    want = np.asarray(window_reverse(jnp.asarray(o.reshape(-1, ws, ws, c)), ws, h, w))
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5, rtol=1e-5)


def test_fused_vjp_matches_reference_grads():
    """Custom VJP (backward kernel, interpret mode) vs autodiff of the
    XLA reference — gradients for qkv and bias."""
    for nwb, seed in ((1, 3), (16, 4)):
        qkv, bias = _case(nwb=nwb, seed=seed)
        scale = 0.37

        def loss_fused(qkv, bias):
            out = fused_window_attention(qkv, bias, 4, 3, scale, interpret=True)
            return jnp.sum(out * jnp.cos(out))

        def loss_ref(qkv, bias):
            out = reference_window_attention(qkv, bias, 4, 3, scale)
            return jnp.sum(out * jnp.cos(out))

        g_f = jax.grad(loss_fused, argnums=(0, 1))(qkv, bias)
        g_r = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
        np.testing.assert_allclose(np.asarray(g_f[0]), np.asarray(g_r[0]),
                                   atol=2e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(g_f[1]), np.asarray(g_r[1]),
                                   atol=2e-4, rtol=1e-4)
