"""Batched tiled inference: exact vs full-image forward when the halo covers
the receptive field."""

import jax
import jax.numpy as jnp
import numpy as np

from basicsr4rs_tpu.ops.tile import tiled_apply


def test_tiled_apply_exact_for_cnn():
    from basicsr4rs_tpu.archs import build_network
    net = build_network({'type': 'MSRResNet', 'num_in_ch': 3, 'num_out_ch': 3,
                         'num_feat': 8, 'num_block': 1, 'upscale': 4})
    x = jnp.asarray(np.random.RandomState(0).rand(2, 37, 45, 3).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x[:, :16, :16])['params']
    fn = jax.jit(lambda v: net.apply({'params': params}, v))
    want = np.asarray(fn(x))
    got = np.asarray(tiled_apply(fn, x, scale=4, tile_size=10, tile_pad=12))
    assert got.shape == want.shape == (2, 148, 180, 3)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_tiled_apply_identity():
    fn = lambda v: jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2)  # noqa: E731
    x = jnp.asarray(np.random.RandomState(1).rand(1, 20, 26, 2).astype(np.float32))
    got = np.asarray(tiled_apply(fn, x, scale=2, tile_size=4, tile_pad=2))
    want = np.asarray(fn(x))
    np.testing.assert_allclose(got, want, atol=1e-6)
