"""flow_warp's TPU fast path (ops/dcn.bilinear_warp — the fused Pallas
hat-function sampler at K2=1) must bit-match the gather formulation in
values AND gradients, for zeros and border padding.

The gather path is itself pinned against torch grid_sample by
tests/test_archs/test_video_parity.py, so matching it transitively pins the
Pallas path to the reference (basicsr/archs/arch_util.py:145-176).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basicsr4rs_tpu.archs.arch_util import flow_warp
from basicsr4rs_tpu.ops import dispatch


def _case(seed=0, n=2, h=16, w=24, c=8, mag=6.0):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.rand(n, h, w, c).astype(np.float32))
    # flows deliberately push many samples off the border, plus exact-integer
    # positions (the hat-gradient convention edge case)
    flow = (rs.rand(n, h, w, 2).astype(np.float32) * 2 - 1) * mag
    flow = flow.round(3)
    flow[0, :2, :2] = 2.0   # integer positions
    flow[0, -1, -1] = 50.0  # fully outside
    return x, jnp.asarray(flow)


@pytest.mark.parametrize('padding_mode', ['zeros', 'border'])
def test_pallas_warp_matches_gather(padding_mode):
    x, flow = _case()
    ref = flow_warp(x, flow, padding_mode=padding_mode)
    with dispatch.force_interpret():
        got = flow_warp(x, flow, padding_mode=padding_mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('padding_mode', ['zeros', 'border'])
def test_pallas_warp_grads_match_gather(padding_mode):
    x, flow = _case(seed=1)

    def loss(xx, ff):
        out = flow_warp(xx, ff, padding_mode=padding_mode)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    gx_ref, gf_ref = jax.grad(loss, argnums=(0, 1))(x, flow)
    with dispatch.force_interpret():
        gx, gf = jax.grad(loss, argnums=(0, 1))(x, flow)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gf_ref),
                               rtol=1e-4, atol=1e-4)


def test_fast_path_declines_gracefully():
    """Off-TPU without force_interpret, bilinear_warp returns None and
    flow_warp still produces the gather result (shape/finite check)."""
    from basicsr4rs_tpu.ops.dcn import bilinear_warp
    x, flow = _case(seed=2)
    if jax.default_backend() != 'tpu':
        assert bilinear_warp(x, flow[..., 1], flow[..., 0]) is None
    out = flow_warp(x, flow)
    assert out.shape == x.shape and bool(jnp.isfinite(out).all())
