"""Multi-device Pallas gating (ops/dispatch.py): an opaque pallas_call
cannot be SPMD-partitioned, so mesh creation with >1 device must route every
fused-kernel dispatch site to its partitionable XLA fallback."""

import jax
import numpy as np

from basicsr4rs_tpu.ops import dispatch
from basicsr4rs_tpu.parallel.mesh import create_mesh


def test_mesh_size_sets_flag():
    prev = dispatch.multi_device()
    try:
        create_mesh(devices=jax.devices()[:1])
        assert not dispatch.multi_device()
        if len(jax.devices()) > 1:
            create_mesh(devices=jax.devices())
            assert dispatch.multi_device()
    finally:
        dispatch.set_multi_device(prev)


def test_fused_paths_still_correct_when_gated():
    """With the flag forced on, the fused entry points must produce the same
    values via their XLA fallbacks (here on CPU both branches are XLA, so
    this pins that the gated dispatch is exercised and correct)."""
    import jax.numpy as jnp
    from basicsr4rs_tpu.ops.mlp_block import fused_mlp_block, reference_mlp_block
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(16, 12).astype(np.float32))
    lns = jnp.ones((12,), jnp.float32)
    lnb = jnp.zeros((12,), jnp.float32)
    w1 = jnp.asarray(rng.randn(12, 24).astype(np.float32) * 0.2)
    b1 = jnp.zeros((24,), jnp.float32)
    w2 = jnp.asarray(rng.randn(24, 12).astype(np.float32) * 0.2)
    b2 = jnp.zeros((12,), jnp.float32)
    prev = dispatch.multi_device()
    try:
        dispatch.set_multi_device(True)
        out = fused_mlp_block(x, lns, lnb, w1, b1, w2, b2, add_residual=True)
        want = x + reference_mlp_block(x, lns, lnb, w1, b1, w2, b2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)
    finally:
        dispatch.set_multi_device(prev)
