"""Mesh-SCOPED Pallas dispatch (ops/dispatch.py): the mesh in effect at a
fused-kernel dispatch site is whatever ``kernel_mesh`` context is active at
trace time — no process-global flag, so unrelated meshes in one process can
never alias each other (the round-2 latest-wins hazard, ADVICE r2)."""

import jax
import numpy as np

from basicsr4rs_tpu.ops import dispatch
from basicsr4rs_tpu.parallel.mesh import create_mesh


def test_unscoped_is_single_device():
    assert dispatch.active_mesh() is None
    assert dispatch.mesh_info() == (None, 1, 1)
    assert dispatch.pallas_ok()


def test_scope_nesting_and_no_aliasing():
    """A size-1 mesh scope and an 8-device scope coexist without aliasing:
    each dispatch site sees exactly the innermost scope (round 2's global
    flag made the *latest created* mesh leak into every later retrace)."""
    big = create_mesh({'parallel': {'data': 8, 'spatial': 1}})
    small = create_mesh(devices=jax.devices()[:1])
    with dispatch.kernel_mesh(big):
        mesh, data, spatial = dispatch.mesh_info()
        assert mesh is big and data == 8 and spatial == 1
        assert not dispatch.pallas_ok()
        with dispatch.kernel_mesh(small):
            # inner size-1 scope: plain single-device dispatch
            assert dispatch.mesh_info() == (None, 1, 1)
            assert dispatch.pallas_ok()
        # restored on exit
        assert dispatch.mesh_info()[0] is big
    assert dispatch.active_mesh() is None


def test_scope_is_trace_time():
    """The scope governs what gets *traced*: a jitted fn whose body opens the
    scope sees the mesh even though the caller does not."""
    mesh = create_mesh({'parallel': {'data': 8, 'spatial': 1}})
    seen = {}

    @jax.jit
    def f(x):
        with dispatch.kernel_mesh(mesh):
            seen['info'] = dispatch.mesh_info()
        return x + 1

    f(np.zeros((4,), np.float32))
    assert seen['info'][0] is mesh and seen['info'][1] == 8
    assert dispatch.active_mesh() is None


def test_fused_mlp_falls_back_on_unshardable_batch():
    """Under a multi-device scope, geometry that cannot shard evenly (batch
    of 1) must route to the partitionable XLA reference — and agree with it."""
    import jax.numpy as jnp
    from basicsr4rs_tpu.ops.mlp_block import fused_mlp_block, reference_mlp_block
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 4, 4, 12).astype(np.float32))  # b=1 on 8 devices
    lns = jnp.ones((12,), jnp.float32)
    lnb = jnp.zeros((12,), jnp.float32)
    w1 = jnp.asarray(rng.randn(12, 24).astype(np.float32) * 0.2)
    b1 = jnp.zeros((24,), jnp.float32)
    w2 = jnp.asarray(rng.randn(24, 12).astype(np.float32) * 0.2)
    b2 = jnp.zeros((12,), jnp.float32)
    mesh = create_mesh({'parallel': {'data': 8, 'spatial': 1}})
    with dispatch.kernel_mesh(mesh):
        out = fused_mlp_block(x, lns, lnb, w1, b1, w2, b2,
                              interpret=True, add_residual=True)
    want = x + reference_mlp_block(x, lns, lnb, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
