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


def test_tiled_apply_swinir_receptive_field():
    """Window-attention tiling (inference_swinir.py --tile): once tile_pad
    covers the model's receptive field (depth x window for this 2-block
    net), tiling is BIT-exact; a smaller halo is approximate — the same
    semantics as the reference tool's tile mode."""
    import jax
    import jax.numpy as jnp

    from basicsr4rs_tpu.archs.swinir_arch import SwinIR
    from basicsr4rs_tpu.models.swinir_model import pad_to_multiple
    from basicsr4rs_tpu.ops.tile import tiled_apply

    net = SwinIR(upscale=4, in_chans=3, img_size=16, window_size=8,
                 img_range=1., depths=[2], embed_dim=16, num_heads=[2],
                 mlp_ratio=2, upsampler='pixelshuffledirect')
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 37, 53, 3))
    params = net.init(jax.random.PRNGKey(1),
                      jnp.zeros((1, 16, 16, 3)))['params']

    def apply(v):
        return net.apply({'params': params}, v)

    xp = pad_to_multiple(x, 8)
    want = np.asarray(apply(xp))
    exact = np.asarray(tiled_apply(apply, xp, 4, 16, tile_pad=16))
    np.testing.assert_array_equal(want, exact)
    approx = np.asarray(tiled_apply(apply, xp, 4, 16, tile_pad=8))
    assert 0 < np.abs(want - approx).max() < 0.05
