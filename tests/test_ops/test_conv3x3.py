"""Fused 3x3 conv kernel vs XLA conv — forward, epilogues (residual /
leaky-relu), full VJP, and mesh sharding, in interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basicsr4rs_tpu.ops.conv3x3 import _xla_conv3x3, fused_conv3x3


def _case(b=2, h=16, w=16, cin=16, cout=24, seed=0):
    # cin >= 16 and w % 8 == 0 so interpret-mode tests exercise the Pallas
    # kernel rather than the geometry-guard XLA fallback
    rng = np.random.RandomState(seed)
    return (jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32) * 0.5),
            jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * 0.2),
            jnp.asarray(0.1 * rng.randn(cout).astype(np.float32)),
            jnp.asarray(rng.randn(b, h, w, cout).astype(np.float32) * 0.5))


@pytest.mark.parametrize('use_res,slope', [(False, None), (True, None),
                                           (False, 0.2), (True, 0.2)])
def test_forward_matches_xla(use_res, slope):
    x, w, b, res = _case(seed=1)
    residual = res if use_res else None
    want = _xla_conv3x3(x, w, b, residual, slope)
    got = fused_conv3x3(x, w, b, residual, slope, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize('use_res,slope', [(False, None), (True, 0.2)])
def test_vjp_matches_xla_grads(use_res, slope):
    x, w, b, res = _case(seed=2)
    residual = res if use_res else None

    def loss_fused(x, w, b, res=None):
        out = fused_conv3x3(x, w, b, res, act_slope=slope, interpret=True)
        return jnp.sum(out * jnp.sin(out))

    def loss_ref(x, w, b, res=None):
        out = _xla_conv3x3(x, w, b, res, slope)
        return jnp.sum(out * jnp.sin(out))

    args = (x, w, b) if residual is None else (x, w, b, residual)
    g_f = jax.grad(loss_fused, argnums=tuple(range(len(args))))(*args)
    g_r = jax.grad(loss_ref, argnums=tuple(range(len(args))))(*args)
    for i, (a, r) in enumerate(zip(g_f, g_r)):
        a, r = np.asarray(a), np.asarray(r)
        err = np.abs(a - r).max() / (np.abs(r).max() + 1e-6)
        assert err < 2e-4, f'grad mismatch arg {i}: rel-err {err:.2e}'


def test_unsupported_geometry_falls_back():
    """Odd widths / tiny channels route to XLA and stay exact."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 10, 10, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 8).astype(np.float32))
    b = jnp.asarray(rng.randn(8).astype(np.float32))
    want = _xla_conv3x3(x, w, b, None, None)
    got = fused_conv3x3(x, w, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_sharded_matches_single():
    from jax.sharding import NamedSharding, PartitionSpec as P
    from basicsr4rs_tpu.ops import dispatch
    from basicsr4rs_tpu.parallel.mesh import create_mesh
    mesh = create_mesh({'parallel': {'data': 8, 'spatial': 1}})
    x, w, b, res = _case(b=8, seed=4)

    def loss(x, w, b, res):
        out = fused_conv3x3(x, w, b, res, act_slope=0.2, interpret=True)
        return jnp.sum(out * jnp.cos(out))

    grad_fn = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3)))
    l1, g1 = grad_fn(x, w, b, res)
    xs = jax.device_put(x, NamedSharding(mesh, P('data')))
    rs_ = jax.device_put(res, NamedSharding(mesh, P('data')))
    with dispatch.kernel_mesh(mesh):
        l2, g2 = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3)))(
            xs, w, b, rs_)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5, atol=1e-5)
    # per-shard partials psum in a different association order than one
    # full-batch reduction — tolerance covers the f32 reordering noise
    for i, (a, r) in enumerate(zip(g2, g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=5e-4,
                                   atol=1e-4, err_msg=f'grad arg {i}')


def test_arch_param_tree_identical_both_paths(monkeypatch):
    """SwinIR builds the same parameter tree (and the same outputs) with
    conv fusion on or off — checkpoints trained either way interchange."""
    import jax
    from basicsr4rs_tpu.archs.swinir_arch import SwinIR
    from basicsr4rs_tpu.ops import dispatch

    kwargs = dict(img_size=16, patch_size=1, in_chans=3, embed_dim=16,
                  depths=(2,), num_heads=(2,), window_size=8, mlp_ratio=2.,
                  upscale=2, img_range=1., upsampler='pixelshuffle',
                  resi_connection='1conv')
    x = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 3)
                    .astype(np.float32))

    monkeypatch.setenv('SWIN_FUSED_CONV', '0')
    net_off = SwinIR(**kwargs)
    params_off = net_off.init(jax.random.PRNGKey(0), x)['params']
    out_off = net_off.apply({'params': params_off}, x)

    monkeypatch.setenv('SWIN_FUSED_CONV', '1')
    net_on = SwinIR(**kwargs)
    with dispatch.force_interpret():
        params_on = net_on.init(jax.random.PRNGKey(0), x)['params']
        out_on = net_on.apply({'params': params_off}, x)

    tree_off = jax.tree_util.tree_map(lambda a: a.shape, params_off)
    tree_on = jax.tree_util.tree_map(lambda a: a.shape, params_on)
    assert tree_off == tree_on
    np.testing.assert_allclose(np.asarray(out_on), np.asarray(out_off),
                               atol=2e-5, rtol=1e-4)
