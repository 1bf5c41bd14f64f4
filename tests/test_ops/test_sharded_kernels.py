"""Fused Pallas kernels under multi-device meshes (VERDICT r2 #1).

Under a ``kernel_mesh`` scope the fused ops shard_map their Pallas calls
over the mesh instead of falling back to XLA: batch operands are consumed
as per-device shards, weights replicated, and weight/bias gradients psum'd
by the shard_map transpose (the DDP grad all-reduce analog). These tests
run the kernels in interpret mode on the 8-device CPU mesh and pin

  * forward outputs  == the single-device fused path, and
  * ALL gradients    == the single-device fused path

for the Swin attention branch, the MLP branch, window attention and the DCN
fused sampler — on 1D ``data=8`` and 2D ``data=4 x spatial=2`` meshes.
Tolerances are 1e-5: per-shard weight-grad partials are reduced in a
different association order than one kernel accumulating the full batch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from basicsr4rs_tpu.ops import dispatch
from basicsr4rs_tpu.parallel.mesh import create_mesh


def _mesh(data, spatial):
    return create_mesh({'parallel': {'data': data, 'spatial': spatial}})


def _put(mesh, x, spec):
    return jax.device_put(x, NamedSharding(mesh, spec))


def _grad_check(fn, args, mesh, specs, tol=1e-5):
    """Compare fn's value+grads traced unscoped (single-device pallas) vs
    traced under the mesh scope with sharded inputs (shard_map pallas)."""
    def loss(*a):
        out = fn(*a)
        return jnp.sum(out * jnp.cos(out)), out

    grad_fn = jax.value_and_grad(loss, argnums=tuple(range(len(args))), has_aux=True)

    (l1, out1), g1 = jax.jit(grad_fn)(*args)

    sharded_args = [_put(mesh, a, s) for a, s in zip(args, specs)]
    with dispatch.kernel_mesh(mesh):
        (l2, out2), g2 = jax.jit(grad_fn)(*sharded_args)

    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1), rtol=tol, atol=tol)
    np.testing.assert_allclose(float(l2), float(l1), rtol=tol, atol=tol)
    for i, (a, b) in enumerate(zip(g1, g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=tol,
                                   atol=tol, err_msg=f'grad arg {i}')


# ------------------------------------------------------------------- MLP
@pytest.mark.parametrize('data,spatial', [(8, 1), (4, 2)])
def test_fused_mlp_sharded_matches_single(data, spatial):
    from basicsr4rs_tpu.ops.mlp_block import fused_mlp_block
    mesh = _mesh(data, spatial)
    rng = np.random.RandomState(0)
    c, hidden = 16, 32
    x = jnp.asarray(rng.randn(8, 8, 16, c).astype(np.float32))
    lns = jnp.asarray(1 + 0.1 * rng.randn(c).astype(np.float32))
    lnb = jnp.asarray(0.1 * rng.randn(c).astype(np.float32))
    w1 = jnp.asarray(rng.randn(c, hidden).astype(np.float32) * 0.2)
    b1 = jnp.asarray(0.1 * rng.randn(hidden).astype(np.float32))
    w2 = jnp.asarray(rng.randn(hidden, c).astype(np.float32) * 0.2)
    b2 = jnp.asarray(0.1 * rng.randn(c).astype(np.float32))

    def op(x, lns, lnb, w1, b1, w2, b2):
        return fused_mlp_block(x, lns, lnb, w1, b1, w2, b2,
                               interpret=True, add_residual=True)

    xspec = P('data', 'spatial') if spatial > 1 else P('data')
    _grad_check(op, (x, lns, lnb, w1, b1, w2, b2), mesh,
                (xspec,) + (P(),) * 6)


# ----------------------------------------------------- window attention
def _attn_inputs(rng, b, h, w, c, heads, nwb_mode, ws):
    n = ws * ws
    qkv = jnp.asarray(rng.randn(b, h, w, 3 * c).astype(np.float32))
    if nwb_mode == 'broadcast':
        nwb = 1
    else:  # per-window (shift-mask case)
        nwb = (h // ws) * (w // ws)
    bias = jnp.asarray(rng.randn(nwb, heads, n, n).astype(np.float32) * 0.5)
    return qkv, bias


@pytest.mark.parametrize('data,spatial', [(8, 1), (4, 2)])
@pytest.mark.parametrize('nwb_mode', ['broadcast', 'per_window'])
def test_fused_window_attention_sharded_matches_single(data, spatial, nwb_mode):
    from basicsr4rs_tpu.ops.window_attention import fused_window_attention
    mesh = _mesh(data, spatial)
    rng = np.random.RandomState(1)
    ws, heads, c = 4, 2, 8
    qkv, bias = _attn_inputs(rng, 8, 8, 8, c, heads, nwb_mode, ws)
    scale = (c // heads) ** -0.5

    def op(qkv, bias):
        return fused_window_attention(qkv, bias, ws, heads, scale,
                                      interpret=True)

    qspec = P('data', 'spatial') if spatial > 1 else P('data')
    bspec = P('spatial') if (spatial > 1 and nwb_mode == 'per_window') else P()
    _grad_check(op, (qkv, bias), mesh, (qspec, bspec))


# ------------------------------------------------------ swin attn block
@pytest.mark.parametrize('data,spatial', [(8, 1), (4, 2)])
@pytest.mark.parametrize('nwb_mode', ['broadcast', 'per_window'])
def test_fused_swin_block_sharded_matches_single(data, spatial, nwb_mode):
    from basicsr4rs_tpu.ops.swin_block import fused_swin_attn_block
    mesh = _mesh(data, spatial)
    rng = np.random.RandomState(2)
    ws, heads, c = 4, 2, 8
    n = ws * ws
    b, h, w = 8, 8, 8
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    lns = jnp.asarray(1 + 0.1 * rng.randn(c).astype(np.float32))
    lnb = jnp.asarray(0.1 * rng.randn(c).astype(np.float32))
    wqkv = jnp.asarray(rng.randn(c, 3 * c).astype(np.float32) * 0.2)
    bqkv = jnp.asarray(0.1 * rng.randn(3 * c).astype(np.float32))
    wproj = jnp.asarray(rng.randn(c, c).astype(np.float32) * 0.2)
    bproj = jnp.asarray(0.1 * rng.randn(c).astype(np.float32))
    nwb = 1 if nwb_mode == 'broadcast' else (h // ws) * (w // ws)
    bias = jnp.asarray(rng.randn(nwb, heads, n, n).astype(np.float32) * 0.5)
    scale = (c // heads) ** -0.5

    def op(x, lns, lnb, wqkv, bqkv, wproj, bproj, bias):
        return fused_swin_attn_block(x, lns, lnb, wqkv, bqkv, wproj, bproj,
                                     bias, ws, heads, scale, interpret=True,
                                     add_residual=True)

    xspec = P('data', 'spatial') if spatial > 1 else P('data')
    bspec = P('spatial') if (spatial > 1 and nwb_mode == 'per_window') else P()
    _grad_check(op, (x, lns, lnb, wqkv, bqkv, wproj, bproj, bias), mesh,
                (xspec,) + (P(),) * 6 + (bspec,))


# ----------------------------------------------------------------- DCN
def test_dcn_pallas_sharded_matches_single():
    from basicsr4rs_tpu.ops.dcn import modulated_deform_conv
    mesh = _mesh(8, 1)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(8, 8, 8, 4).astype(np.float32))
    w = jnp.asarray(rng.rand(3, 3, 4, 6).astype(np.float32))
    offset = jnp.asarray(rng.randn(8, 8, 8, 2 * 2 * 9).astype(np.float32))
    mask = jnp.asarray(rng.rand(8, 8, 8, 2 * 9).astype(np.float32))

    def op(x, offset, mask, w):
        return modulated_deform_conv(x, offset, mask, w, None,
                                     deform_groups=2,
                                     method='pallas_interpret')

    _grad_check(op, (x, offset, mask, w), mesh,
                (P('data'), P('data'), P('data'), P()))


def test_dcn_auto_under_spatial_mesh_uses_onehot():
    """'auto' on a spatial mesh must pick the partitionable one-hot path and
    still match the gather reference (no silent wrong-halo pallas)."""
    from basicsr4rs_tpu.ops.dcn import modulated_deform_conv
    mesh = _mesh(4, 2)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(4, 8, 8, 4).astype(np.float32))
    w = jnp.asarray(rng.rand(3, 3, 4, 6).astype(np.float32))
    offset = jnp.asarray(rng.randn(4, 8, 8, 18).astype(np.float32))
    mask = jnp.asarray(rng.rand(4, 8, 8, 9).astype(np.float32))
    want = modulated_deform_conv(x, offset, mask, w, None, method='gather')

    xs = _put(mesh, x, P('data', 'spatial'))
    with dispatch.kernel_mesh(mesh):
        got = jax.jit(lambda *a: modulated_deform_conv(*a, None, method='onehot'))(
            xs, _put(mesh, offset, P('data', 'spatial')),
            _put(mesh, mask, P('data', 'spatial')), _put(mesh, w, P()))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


# ------------------------------------------------ joint attn+MLP block
@pytest.mark.parametrize('data,spatial', [(8, 1), (4, 2)])
@pytest.mark.parametrize('nwb_mode', ['broadcast', 'per_window'])
def test_fused_joint_block_sharded_matches_single(data, spatial, nwb_mode):
    from basicsr4rs_tpu.ops.swin_block import fused_swin_block_full
    mesh = _mesh(data, spatial)
    rng = np.random.RandomState(5)
    ws, heads, c, hidden = 4, 2, 8, 16
    n = ws * ws
    b, h, w = 8, 8, 8
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    lns = jnp.asarray(1 + 0.1 * rng.randn(c).astype(np.float32))
    lnb = jnp.asarray(0.1 * rng.randn(c).astype(np.float32))
    wqkv = jnp.asarray(rng.randn(c, 3 * c).astype(np.float32) * 0.2)
    bqkv = jnp.asarray(0.1 * rng.randn(3 * c).astype(np.float32))
    wproj = jnp.asarray(rng.randn(c, c).astype(np.float32) * 0.2)
    bproj = jnp.asarray(0.1 * rng.randn(c).astype(np.float32))
    nwb = 1 if nwb_mode == 'broadcast' else (h // ws) * (w // ws)
    bias = jnp.asarray(rng.randn(nwb, heads, n, n).astype(np.float32) * 0.5)
    ln2s = jnp.asarray(1 + 0.1 * rng.randn(c).astype(np.float32))
    ln2b = jnp.asarray(0.1 * rng.randn(c).astype(np.float32))
    w1 = jnp.asarray(rng.randn(c, hidden).astype(np.float32) * 0.2)
    b1 = jnp.asarray(0.1 * rng.randn(hidden).astype(np.float32))
    w2 = jnp.asarray(rng.randn(hidden, c).astype(np.float32) * 0.2)
    b2 = jnp.asarray(0.1 * rng.randn(c).astype(np.float32))
    scale = (c // heads) ** -0.5

    def op(x, lns, lnb, wqkv, bqkv, wproj, bproj, bias,
           ln2s, ln2b, w1, b1, w2, b2):
        return fused_swin_block_full(x, lns, lnb, wqkv, bqkv, wproj, bproj,
                                     bias, ln2s, ln2b, w1, b1, w2, b2,
                                     ws, heads, scale, interpret=True)

    xspec = P('data', 'spatial') if spatial > 1 else P('data')
    bspec = P('spatial') if (spatial > 1 and nwb_mode == 'per_window') else P()
    _grad_check(op, (x, lns, lnb, wqkv, bqkv, wproj, bproj, bias,
                     ln2s, ln2b, w1, b1, w2, b2), mesh,
                (xspec,) + (P(),) * 6 + (bspec,) + (P(),) * 6)
