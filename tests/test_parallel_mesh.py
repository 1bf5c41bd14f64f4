"""Mesh/sharding semantics: data-parallel and spatial (context-parallel)
execution must be numerically identical to single-device execution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
