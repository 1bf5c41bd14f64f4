"""Mesh exactness for the HARD model families (VERDICT r2 #5).

tests/test_parallel_mesh.py proves plain-conv (MSRResNet) sharding; the
families most likely to break under SPMD are the ones with shift-rolls and
window masks (SwinIR), opaque fused kernels behind shard_map (SwinIR fused
path, EDVR's DCN sampler), and lax.scan-over-time recurrence (BasicVSR).
Each test pins multi-device execution — including the 2D data x spatial
mesh — against single-device execution of the *same* code path.

``force_interpret`` routes the fused dispatch sites onto the real Pallas
kernels (interpret mode) so the shard_map wrapping is exercised end-to-end
through whole models on the CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from basicsr4rs_tpu.ops import dispatch
from basicsr4rs_tpu.parallel.mesh import create_mesh, replicate


def _mesh(data, spatial):
    return create_mesh({'parallel': {'data': data, 'spatial': spatial}})


def _shard(mesh, x, spec):
    return jax.device_put(x, NamedSharding(mesh, spec))


# ---------------------------------------------------------------- SwinIR
@pytest.fixture(scope='module')
def swinir_net_params():
    from basicsr4rs_tpu.archs.swinir_arch import SwinIR
    net = SwinIR(img_size=16, in_chans=3, embed_dim=8, depths=(2,),
                 num_heads=(2,), window_size=4, mlp_ratio=2., upscale=2,
                 upsampler='pixelshuffledirect', drop_path_rate=0.)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)['params']
    return net, params


@pytest.mark.parametrize('data,spatial', [(8, 1), (4, 2)])
def test_swinir_mesh_exactness_reference_path(swinir_net_params, data, spatial):
    """XLA path under SPMD: shift-rolls and per-window attention masks must
    survive batch AND H-axis sharding (halo/permute collectives from XLA)."""
    net, params = swinir_net_params
    mesh = _mesh(data, spatial)
    x = np.random.RandomState(0).rand(8, 16, 16, 3).astype(np.float32)
    want = np.asarray(net.apply({'params': params}, jnp.asarray(x)))
    spec = P('data', 'spatial') if spatial > 1 else P('data')
    xs = _shard(mesh, x, spec)
    ps = replicate(params, mesh)
    got = np.asarray(jax.jit(lambda p, v: net.apply({'params': p}, v))(ps, xs))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize('data,spatial', [(8, 1), (4, 2)])
def test_swinir_mesh_exactness_fused_kernels(swinir_net_params, data, spatial):
    """Fused Pallas path under shard_map: whole-model forward on the mesh
    must match the single-device fused forward (kernels stay ACTIVE at
    mesh scale — the round-2 design lost them; VERDICT r2 #1)."""
    net, params = swinir_net_params
    mesh = _mesh(data, spatial)
    x = np.random.RandomState(1).rand(8, 16, 16, 3).astype(np.float32)

    with dispatch.force_interpret():
        want = np.asarray(jax.jit(
            lambda p, v: net.apply({'params': p}, v))(params, jnp.asarray(x)))

    spec = P('data', 'spatial') if spatial > 1 else P('data')
    xs = _shard(mesh, x, spec)
    ps = replicate(params, mesh)
    with dispatch.force_interpret(), dispatch.kernel_mesh(mesh):
        got = np.asarray(jax.jit(lambda p, v: net.apply({'params': p}, v))(ps, xs))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_swinir_mesh_grads_fused_kernels(swinir_net_params):
    """Training-step analog: parameter gradients through the fused kernels
    on the 8-device mesh == single-device gradients (weight-grad psum via
    the shard_map transpose — the DDP all-reduce)."""
    net, params = swinir_net_params
    mesh = _mesh(8, 1)
    rng = np.random.RandomState(2)
    x = rng.rand(8, 16, 16, 3).astype(np.float32)
    tgt = rng.rand(8, 32, 32, 3).astype(np.float32)

    def loss(p, v, t):
        return jnp.mean(jnp.abs(net.apply({'params': p}, v) - t))

    with dispatch.force_interpret():
        l1, g1 = jax.jit(jax.value_and_grad(loss))(params, jnp.asarray(x),
                                                   jnp.asarray(tgt))

    xs = _shard(mesh, x, P('data'))
    ts = _shard(mesh, tgt, P('data'))
    ps = replicate(params, mesh)
    with dispatch.force_interpret(), dispatch.kernel_mesh(mesh):
        l2, g2 = jax.jit(jax.value_and_grad(loss))(ps, xs, ts)

    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5, atol=1e-6)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(g2))
    for path, a in flat1:
        b = flat2[path]
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4,
                                   atol=1e-5, err_msg=jax.tree_util.keystr(path))


# ------------------------------------------------------------------ EDVR
def test_edvr_mesh_exactness_dcn_pallas():
    """EDVR (PCD cascaded DCN alignment) on the 8-device data mesh with the
    fused Pallas DCN sampler sharded via shard_map — forward must match the
    single-device fused forward."""
    from basicsr4rs_tpu.archs.edvr_arch import EDVR
    net = EDVR(num_feat=8, num_frame=3, deformable_groups=2,
               num_extract_block=1, num_reconstruct_block=1,
               center_frame_idx=1)
    x = np.random.RandomState(3).rand(8, 3, 16, 16, 3).astype(np.float32)
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))['params']

    with dispatch.force_interpret():
        want = np.asarray(jax.jit(
            lambda p, v: net.apply({'params': p}, v))(params, jnp.asarray(x)))

    mesh = _mesh(8, 1)
    xs = _shard(mesh, x, P('data'))
    ps = replicate(params, mesh)
    with dispatch.force_interpret(), dispatch.kernel_mesh(mesh):
        got = np.asarray(jax.jit(lambda p, v: net.apply({'params': p}, v))(ps, xs))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


# -------------------------------------------------------------- BasicVSR
def test_basicvsr_mesh_exactness():
    """Recurrent (scan-over-time) propagation under data sharding: the
    temporal dependency is per-sample, so batch sharding must be exact."""
    from basicsr4rs_tpu.archs.basicvsr_arch import BasicVSR
    net = BasicVSR(num_feat=8, num_block=1)
    x = np.random.RandomState(4).rand(8, 2, 36, 36, 3).astype(np.float32)
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))['params']
    want = np.asarray(net.apply({'params': params}, jnp.asarray(x)))

    mesh = _mesh(8, 1)
    xs = _shard(mesh, x, P('data'))
    ps = replicate(params, mesh)
    got = np.asarray(jax.jit(lambda p, v: net.apply({'params': p}, v))(ps, xs))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)
