"""Mesh/sharding semantics: data-parallel and spatial (context-parallel)
execution must be numerically identical to single-device execution.

Beyond the plain-conv MSRResNet case, the families most likely to break
under SPMD each get a model-level exactness test (VERDICT r2 #5):

* SwinIR — fused Pallas kernels (shard_map), shift-rolls and window masks,
  on the 1D data mesh AND the 2D data x spatial mesh;
* EDVR — the DCN sampler dispatch under a data mesh;
* BasicVSR — ``lax.scan``-over-time recurrence under data sharding.
"""

import contextlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from basicsr4rs_tpu.ops import dispatch
from basicsr4rs_tpu.parallel.mesh import batch_spec, create_mesh, replicate, shard_batch


@pytest.fixture(scope='module')
def net_and_params():
    from basicsr4rs_tpu.archs import build_network
    net = build_network({'type': 'MSRResNet', 'num_in_ch': 3, 'num_out_ch': 3,
                         'num_feat': 8, 'num_block': 2, 'upscale': 4})
    x = jnp.zeros((1, 16, 16, 3))
    params = net.init(jax.random.PRNGKey(0), x)['params']
    return net, params


def test_data_parallel_exactness(net_and_params):
    net, params = net_and_params
    mesh = create_mesh({'parallel': {'data': 8, 'spatial': 1}})
    x = np.random.RandomState(0).rand(8, 16, 16, 3).astype(np.float32)
    want = np.asarray(net.apply({'params': params}, jnp.asarray(x)))
    xs = shard_batch({'x': x}, mesh)['x']
    ps = replicate(params, mesh)
    got = np.asarray(jax.jit(lambda p, v: net.apply({'params': p}, v))(ps, xs))
    np.testing.assert_array_equal(got, want)


def test_spatial_sharding_exactness(net_and_params):
    """H-axis sharding: XLA's SPMD partitioner must insert conv halo
    exchanges; the result is bit-identical to unsharded execution."""
    net, params = net_and_params
    mesh = create_mesh({'parallel': {'data': 2, 'spatial': 4}})
    x = np.random.RandomState(1).rand(2, 32, 32, 3).astype(np.float32)
    want = np.asarray(net.apply({'params': params}, jnp.asarray(x)))
    xs = shard_batch({'x': x}, mesh, spatial_sharded=True)['x']
    assert len(xs.sharding.device_set) == 8
    ps = replicate(params, mesh)
    got = np.asarray(jax.jit(lambda p, v: net.apply({'params': p}, v))(ps, xs))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)


def test_mesh_validation():
    with pytest.raises(ValueError):
        create_mesh({'parallel': {'data': 3, 'spatial': 2}})  # 6 != 8


def test_video_batch_spatial_spec_lands_on_h():
    """Spatial sharding must hit the H axis per leaf rank — (B,T,H,W,C)
    video shards axis 2, never the time axis (a recurrent scan over a
    sharded time axis would gather whole clips)."""
    from jax.sharding import PartitionSpec as P
    mesh = create_mesh({'parallel': {'data': 2, 'spatial': 4}})
    assert batch_spec(mesh, True, ndim=4) == P('data', 'spatial')
    assert batch_spec(mesh, True, ndim=5) == P('data', None, 'spatial')
    batch = {'lq': np.zeros((2, 3, 32, 16, 3), np.float32),   # video 5D
             'gt': np.zeros((2, 64, 64, 3), np.float32)}      # image 4D
    out = shard_batch(batch, mesh, spatial_sharded=True)
    assert out['lq'].sharding.spec == P('data', None, 'spatial')
    assert out['gt'].sharding.spec == P('data', 'spatial')


def _mesh_vs_single(net, params, x, mesh, xspec, fused=False, grads=False, tol=1e-5):
    """Forward (and optionally param grads) on the mesh vs one device.
    Fresh jax.jit objects per trace: the kernel_mesh scope is trace-time."""
    def loss(p, v):
        out = net.apply({'params': p}, v)
        return jnp.sum(out * jnp.cos(out)), out

    ctx = dispatch.force_interpret() if fused else contextlib.nullcontext()
    with ctx:
        fn = jax.value_and_grad(loss, has_aux=True) if grads else loss
        (l1, out1), g1 = _call(jax.jit(fn), params, x, grads)
        xs = jax.device_put(x, NamedSharding(mesh, xspec))
        ps = replicate(params, mesh)
        with dispatch.kernel_mesh(mesh):
            (l2, out2), g2 = _call(jax.jit(fn), ps, xs, grads)

    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1),
                               rtol=tol, atol=tol)
    if grads:
        np.testing.assert_allclose(float(l2), float(l1), rtol=tol, atol=tol)
        flat1 = jax.tree_util.tree_leaves_with_path(g1)
        flat2 = jax.tree_util.tree_leaves(g2)
        for (kp, a), b in zip(flat1, flat2):
            a = np.asarray(a)
            # per-shard partial grads psum in a different association order
            # than one full-batch kernel: scale atol by the leaf magnitude
            scaled_atol = tol * max(1., float(np.abs(a).max()))
            np.testing.assert_allclose(np.asarray(b), a, rtol=tol,
                                       atol=scaled_atol,
                                       err_msg=jax.tree_util.keystr(kp))


def _call(fn, p, v, grads):
    if grads:
        (l, out), g = fn(p, v)
        return (l, out), g
    l, out = fn(p, v)
    return (l, out), None


@pytest.mark.parametrize('data,spatial', [(8, 1), (4, 2)])
def test_swinir_mesh_exactness(data, spatial):
    """SwinIR through the fused Pallas kernels (interpret mode), shift-rolls
    and per-window masks included (depths=[2] -> one shifted block), must be
    exact on the mesh — incl. H sharded across 'spatial'."""
    from basicsr4rs_tpu.archs import build_network
    net = build_network({'type': 'SwinIR', 'img_size': 16, 'in_chans': 3,
                         'embed_dim': 8, 'depths': [2], 'num_heads': [2],
                         'window_size': 4, 'mlp_ratio': 2, 'upscale': 2,
                         'upsampler': 'pixelshuffledirect', 'drop_path_rate': 0.0})
    x = jnp.asarray(np.random.RandomState(0).rand(8, 16, 16, 3).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x)['params']
    mesh = create_mesh({'parallel': {'data': data, 'spatial': spatial}})
    xspec = P('data', 'spatial') if spatial > 1 else P('data')
    _mesh_vs_single(net, params, x, mesh, xspec, fused=True, grads=True)


def test_edvr_mesh_exactness():
    """EDVR (PCD cascaded DCN + TSA) under the data mesh: the DCN dispatch
    must produce the single-device result whatever sampler it picks."""
    from basicsr4rs_tpu.archs import build_network
    net = build_network({'type': 'EDVR', 'num_feat': 8, 'num_frame': 5,
                         'deformable_groups': 2, 'num_extract_block': 1,
                         'num_reconstruct_block': 1, 'with_tsa': True})
    x = jnp.asarray(np.random.RandomState(1).rand(8, 5, 16, 16, 3).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x)['params']
    mesh = create_mesh({'parallel': {'data': 8, 'spatial': 1}})
    _mesh_vs_single(net, params, x, mesh, P('data'), fused=True)


def test_basicvsr_mesh_exactness():
    """BasicVSR's nn.scan temporal recurrence under data sharding."""
    from basicsr4rs_tpu.archs import build_network
    net = build_network({'type': 'BasicVSR', 'num_feat': 8, 'num_block': 1})
    x = jnp.asarray(np.random.RandomState(2).rand(8, 3, 64, 64, 3).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x)['params']
    mesh = create_mesh({'parallel': {'data': 8, 'spatial': 1}})
    _mesh_vs_single(net, params, x, mesh, P('data'))


def test_basicvsr_spatial_mesh_exactness():
    """BasicVSR on the 2D data x spatial mesh: flow_warp's gathers and the
    temporal scan under H-sharding must still match single-device (XLA's
    partitioner may pay gathers for the warp — correctness is what this
    pins; video production meshes should prefer data-only)."""
    from basicsr4rs_tpu.archs import build_network
    net = build_network({'type': 'BasicVSR', 'num_feat': 8, 'num_block': 1})
    x = jnp.asarray(np.random.RandomState(4).rand(2, 3, 64, 64, 3).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x)['params']
    mesh = create_mesh({'parallel': {'data': 2, 'spatial': 4}})
    _mesh_vs_single(net, params, x, mesh, P('data', None, 'spatial'))


def test_diffusion_unet_mesh_exactness():
    """ResShift's UNetModelSwin (timestep embedding + swin attention stages)
    under the data mesh."""
    from basicsr4rs_tpu.archs.unet_arch import UNetModelSwin
    net = UNetModelSwin(image_size=16, in_channels=3, model_channels=32,
                        out_channels=3, num_res_blocks=1,
                        attention_resolutions=[8], channel_mult=[1, 2],
                        num_heads=4, swin_embed_dim=32, window_size=4,
                        cond_lq=True, lq_size=16)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(8, 16, 16, 3).astype(np.float32))
    t = jnp.asarray(np.arange(8, dtype=np.int64) % 4)
    lq = jnp.asarray(rng.randn(8, 16, 16, 3).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x, t, lq=lq)['params']
    mesh = create_mesh({'parallel': {'data': 8, 'spatial': 1}})

    def fwd(p, v, tt, ll):
        return net.apply({'params': p}, v, tt, lq=ll)

    want = np.asarray(jax.jit(fwd)(params, x, t, lq))
    ps = replicate(params, mesh)
    vs = jax.device_put(x, NamedSharding(mesh, P('data')))
    ts = jax.device_put(t, NamedSharding(mesh, P('data')))
    ls = jax.device_put(lq, NamedSharding(mesh, P('data')))
    with dispatch.kernel_mesh(mesh):
        got = np.asarray(jax.jit(fwd)(ps, vs, ts, ls))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_stylegan2_mesh_exactness():
    """StyleGAN2's modulated conv folds the batch into the weight/channel
    axes (batch_group_count trick) — the one formulation in the repo where
    'shard over data' isn't trivially per-sample. SPMD must still match
    single-device."""
    from basicsr4rs_tpu.archs import build_network
    net = build_network({'type': 'StyleGAN2Generator', 'out_size': 32,
                         'num_style_feat': 16, 'num_mlp': 2,
                         'channel_multiplier': 1})
    z = jnp.asarray(np.random.RandomState(6).randn(8, 16).astype(np.float32))
    params = net.init({'params': jax.random.PRNGKey(0),
                       'noise': jax.random.PRNGKey(1)}, [z])['params']

    def fwd(p, v):
        out, _ = net.apply({'params': p}, [v], rngs={'noise': jax.random.PRNGKey(7)})
        return out

    want = np.asarray(jax.jit(fwd)(params, z))
    mesh = create_mesh({'parallel': {'data': 8, 'spatial': 1}})
    zs = jax.device_put(z, NamedSharding(mesh, P('data')))
    ps = replicate(params, mesh)
    with dispatch.kernel_mesh(mesh):
        got = np.asarray(jax.jit(fwd)(ps, zs))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_basicvsrpp_mesh_exactness():
    """BasicVSR++: second-order scan propagation + flow-guided DCN alignment
    under data sharding.

    Not assert_allclose: DCN sampling positions come from offset convs, and
    the batch-1-per-shard vs batch-8 XLA compilations differ by ulps — at
    near-integer positions that flips ``floor`` to the adjacent bilinear
    cell, giving sparse O(1e-1) diffs that are compilation noise, not SPMD
    bugs (kernel-level bit-parity with identical offsets is pinned in
    test_sharded_kernels). A real sharding bug breaks whole shards; we pin
    the sparse-flip signature instead: >=99.5% of elements within 2e-5."""
    from basicsr4rs_tpu.archs import build_network
    net = build_network({'type': 'BasicVSRPlusPlus', 'mid_channels': 8,
                         'num_blocks': 1})
    x = jnp.asarray(np.random.RandomState(3).rand(8, 3, 64, 64, 3).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x)['params']
    mesh = create_mesh({'parallel': {'data': 8, 'spatial': 1}})

    def loss(p, v):
        out = net.apply({'params': p}, v)
        return jnp.sum(out * jnp.cos(out)), out

    with dispatch.force_interpret():
        _, out1 = jax.jit(loss)(params, x)
        xs = jax.device_put(x, NamedSharding(mesh, P('data')))
        ps = replicate(params, mesh)
        with dispatch.kernel_mesh(mesh):
            _, out2 = jax.jit(loss)(ps, xs)
    diff = np.abs(np.asarray(out2) - np.asarray(out1))
    frac_close = float((diff <= 2e-5).mean())
    assert frac_close >= 0.995, f'only {frac_close:.4%} of elements match'
    assert float(diff.max()) < 0.5, f'non-sparse divergence, max {diff.max()}'
