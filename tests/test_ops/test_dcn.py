"""DCNv2 correctness tests. The reference CUDA kernels can't run here, so
correctness is anchored analytically: zero offsets reduce to a plain conv,
integer offsets reduce to convs of shifted inputs, masks scale taps, and
gradients check numerically (the reference col2im backward equivalence)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basicsr4rs_tpu.ops.dcn import DCNv2Pack, ModulatedDeformConvPack, modulated_deform_conv


def _conv_ref(x, w, b):
    out = jax.lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                       dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return out + b


def test_zero_offset_equals_conv():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 8, 8, 4).astype(np.float32))
    w = jnp.asarray(rng.rand(3, 3, 4, 6).astype(np.float32))
    b = jnp.asarray(rng.rand(6).astype(np.float32))
    offset = jnp.zeros((2, 8, 8, 2 * 9))
    mask = jnp.ones((2, 8, 8, 9))
    out = modulated_deform_conv(x, offset, mask, w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_conv_ref(x, w, b)), atol=1e-5)


def test_integer_offset_shifts_sampling():
    """Constant offset (dy=1, dx=0) equals conv over the y-shifted input."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 10, 10, 2).astype(np.float32))
    w = jnp.asarray(rng.rand(3, 3, 2, 3).astype(np.float32))
    offset = jnp.zeros((1, 10, 10, 18)).at[..., 0::2].set(1.0)  # dy=1 for all taps
    mask = jnp.ones((1, 10, 10, 9))
    out = modulated_deform_conv(x, offset, mask, w, None)
    x_shift = jnp.pad(x, ((0, 0), (0, 1), (0, 0), (0, 0)))[:, 1:]  # shift up
    ref = jax.lax.conv_general_dilated(x_shift, w, (1, 1), [(1, 1), (1, 1)],
                                       dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    # interior rows only (borders differ: zero-pad boundary semantics)
    np.testing.assert_allclose(np.asarray(out)[:, 1:-2], np.asarray(ref)[:, 1:-2], atol=1e-5)


def test_fractional_offset_interpolates():
    """dy=0.5 everywhere = average of dy=0 and dy=1 results (bilinear)."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(1, 8, 8, 2).astype(np.float32))
    w = jnp.asarray(rng.rand(3, 3, 2, 2).astype(np.float32))
    mask = jnp.ones((1, 8, 8, 9))

    def run(dy):
        offset = jnp.zeros((1, 8, 8, 18)).at[..., 0::2].set(dy)
        return modulated_deform_conv(x, offset, mask, w, None)

    mid = run(0.5)
    avg = (run(0.0) + run(1.0)) / 2
    np.testing.assert_allclose(np.asarray(mid)[:, 2:-2, 2:-2], np.asarray(avg)[:, 2:-2, 2:-2], atol=1e-5)


def test_mask_scales_taps():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(1, 8, 8, 2).astype(np.float32))
    w = jnp.asarray(rng.rand(3, 3, 2, 2).astype(np.float32))
    offset = jnp.zeros((1, 8, 8, 18))
    half = modulated_deform_conv(x, offset, jnp.full((1, 8, 8, 9), 0.5), w, None)
    full = modulated_deform_conv(x, offset, jnp.ones((1, 8, 8, 9)), w, None)
    np.testing.assert_allclose(np.asarray(half), np.asarray(full) * 0.5, atol=1e-6)


def test_deform_groups():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(1, 8, 8, 4).astype(np.float32))
    w = jnp.asarray(rng.rand(3, 3, 4, 4).astype(np.float32))
    offset = jnp.zeros((1, 8, 8, 2 * 2 * 9))
    mask = jnp.ones((1, 8, 8, 2 * 9))
    out = modulated_deform_conv(x, offset, mask, w, None, deform_groups=2)
    ref = jax.lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                       dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_gradients_flow():
    """All inputs receive finite, nonzero gradients (col2im equivalence)."""
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.rand(1, 6, 6, 2).astype(np.float32))
    w = jnp.asarray(rng.rand(3, 3, 2, 2).astype(np.float32))
    offset = jnp.asarray(rng.randn(1, 6, 6, 18).astype(np.float32) * 0.3)
    mask = jnp.asarray(rng.rand(1, 6, 6, 9).astype(np.float32))

    def loss(x, offset, mask, w):
        return jnp.sum(modulated_deform_conv(x, offset, mask, w, None) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(x, offset, mask, w)
    for g, name in zip(grads, ['x', 'offset', 'mask', 'weight']):
        assert np.all(np.isfinite(np.asarray(g))), f'{name} grad not finite'
        assert float(jnp.abs(g).max()) > 0, f'{name} grad all-zero'

    # numerical check on a single weight element
    eps = 1e-3
    w_p = w.at[1, 1, 0, 0].add(eps)
    w_m = w.at[1, 1, 0, 0].add(-eps)
    num = (loss(x, offset, mask, w_p) - loss(x, offset, mask, w_m)) / (2 * eps)
    np.testing.assert_allclose(float(grads[3][1, 1, 0, 0]), float(num), rtol=1e-2)


def test_dcnv2pack_module():
    """DCNv2Pack with zero-init offset conv == plain conv at init."""
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.rand(1, 8, 8, 4).astype(np.float32))
    feat = jnp.asarray(rng.rand(1, 8, 8, 4).astype(np.float32))
    dcn = DCNv2Pack(in_channels=4, out_channels=6, deformable_groups=2)
    params = dcn.init(jax.random.PRNGKey(0), x, feat)['params']
    out = dcn.apply({'params': params}, x, feat)
    assert out.shape == (1, 8, 8, 6)
    # offset conv zero-init -> mask sigmoid(0)=0.5 -> equals 0.5 * conv
    w = params['kernel']
    b = params['bias']
    ref = 0.5 * jax.lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                             dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref + b * 0 + b), atol=1e-5)


@pytest.mark.parametrize('dg', [1, 2])
def test_onehot_sampler_matches_gather(dg):
    """The TPU one-hot matmul formulation must equal the gather formulation
    (same bilinear weights, same zero-pad border semantics) — fwd and grads."""
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.rand(2, 7, 9, 4).astype(np.float32))
    w = jnp.asarray(rng.rand(3, 3, 4, 6).astype(np.float32))
    # large offsets push samples off the border to hit the outside-mask path
    offset = jnp.asarray(rng.randn(2, 7, 9, 2 * dg * 9).astype(np.float32) * 3.0)
    mask = jnp.asarray(rng.rand(2, 7, 9, dg * 9).astype(np.float32))

    def run(method):
        return modulated_deform_conv(x, offset, mask, w, None,
                                     deform_groups=dg, method=method)

    np.testing.assert_allclose(np.asarray(run('onehot')), np.asarray(run('gather')),
                               rtol=1e-5, atol=1e-5)

    def loss(method, x, offset, mask, w):
        return jnp.sum(modulated_deform_conv(x, offset, mask, w, None,
                                             deform_groups=dg, method=method) ** 2)

    g_one = jax.grad(lambda *a: loss('onehot', *a), argnums=(0, 1, 2, 3))(x, offset, mask, w)
    g_gat = jax.grad(lambda *a: loss('gather', *a), argnums=(0, 1, 2, 3))(x, offset, mask, w)
    for a, b, name in zip(g_one, g_gat, ['x', 'offset', 'mask', 'weight']):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
                                   err_msg=f'{name} grad mismatch')


@pytest.mark.parametrize('dg', [1, 2])
def test_pallas_sampler_matches_gather(dg):
    """The fused Pallas sampler (interpret mode on CPU) must equal the gather
    formulation — fwd and grads — including unaligned shapes (P not a
    multiple of 128, odd H/W) and off-border samples."""
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.rand(2, 9, 11, 4).astype(np.float32))
    w = jnp.asarray(rng.rand(3, 3, 4, 6).astype(np.float32))
    offset = jnp.asarray(rng.randn(2, 9, 11, 2 * dg * 9).astype(np.float32) * 3.0)
    mask = jnp.asarray(rng.rand(2, 9, 11, dg * 9).astype(np.float32))

    def run(method):
        return modulated_deform_conv(x, offset, mask, w, None,
                                     deform_groups=dg, method=method)

    np.testing.assert_allclose(np.asarray(run('pallas_interpret')),
                               np.asarray(run('gather')), rtol=1e-5, atol=1e-5)

    def loss(method, x, offset, mask, w):
        return jnp.sum(modulated_deform_conv(x, offset, mask, w, None,
                                             deform_groups=dg, method=method) ** 2)

    g_pal = jax.grad(lambda *a: loss('pallas_interpret', *a), argnums=(0, 1, 2, 3))(
        x, offset, mask, w)
    g_gat = jax.grad(lambda *a: loss('gather', *a), argnums=(0, 1, 2, 3))(
        x, offset, mask, w)
    for a, b, name in zip(g_pal, g_gat, ['x', 'offset', 'mask', 'weight']):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
                                   err_msg=f'{name} grad mismatch')


@pytest.mark.parametrize('method', ['onehot', 'pallas_interpret'])
@pytest.mark.parametrize('stride,dilation', [(2, 1), (1, 2)])
def test_samplers_with_stride_dilation(method, stride, dilation):
    """Strided / dilated DCN must agree across sampler formulations."""
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.rand(1, 12, 14, 4).astype(np.float32))
    w = jnp.asarray(rng.rand(3, 3, 4, 6).astype(np.float32))
    ho = (12 + 2 - dilation * 2 - 1) // stride + 1
    wo = (14 + 2 - dilation * 2 - 1) // stride + 1
    offset = jnp.asarray(rng.randn(1, ho, wo, 2 * 2 * 9).astype(np.float32) * 2)
    mask = jnp.asarray(rng.rand(1, ho, wo, 2 * 9).astype(np.float32))

    def run(m):
        return modulated_deform_conv(x, offset, mask, w, None, stride=stride,
                                     padding=1, dilation=dilation,
                                     deform_groups=2, method=m)

    np.testing.assert_allclose(np.asarray(run(method)),
                               np.asarray(run('gather')), rtol=1e-5, atol=1e-5)


def test_grouped_conv_all_methods():
    """groups>1 weight contraction agrees across formulations."""
    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.rand(2, 8, 8, 8).astype(np.float32))
    w = jnp.asarray(rng.rand(3, 3, 4, 8).astype(np.float32))  # groups=2
    offset = jnp.asarray(rng.randn(2, 8, 8, 2 * 2 * 9).astype(np.float32))
    mask = jnp.asarray(rng.rand(2, 8, 8, 2 * 9).astype(np.float32))

    def run(m):
        return modulated_deform_conv(x, offset, mask, w, None, groups=2,
                                     deform_groups=2, method=m)

    ref = np.asarray(run('gather'))
    for m in ('onehot', 'pallas_interpret'):
        np.testing.assert_allclose(np.asarray(run(m)), ref, rtol=1e-5,
                                   atol=1e-5, err_msg=m)


@pytest.mark.parametrize('method', ['onehot', 'pallas_interpret'])
def test_offset_grad_nonzero_at_integer_positions(method):
    """At EXACTLY zero offsets (DCNv2Pack's init state: zero-init offset
    conv), the offset gradient must match the gather path's floor-convention
    one-sided bilinear derivative — NOT be zero. A symmetric hat-function
    derivative is identically zero at integer sampling positions, which
    would freeze offset training forever from init (ADVICE r2, high)."""
    rng = np.random.RandomState(13)
    x = jnp.asarray(rng.rand(1, 8, 8, 4).astype(np.float32))
    w = jnp.asarray(rng.rand(3, 3, 4, 4).astype(np.float32))
    offset = jnp.zeros((1, 8, 8, 18), jnp.float32)
    mask = jnp.ones((1, 8, 8, 9), jnp.float32)

    def loss(m, off):
        return jnp.sum(modulated_deform_conv(x, off, mask, w, None, method=m) ** 2)

    g = jax.grad(lambda off: loss(method, off))(offset)
    g_ref = jax.grad(lambda off: loss('gather', off))(offset)
    assert float(jnp.abs(g).mean()) > 1e-3, 'offset grad vanished at init'
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_modulated_pack_module():
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.rand(2, 8, 8, 4).astype(np.float32))
    m = ModulatedDeformConvPack(in_channels=4, out_channels=4)
    params = m.init(jax.random.PRNGKey(0), x)['params']
    out = m.apply({'params': params}, x)
    assert out.shape == (2, 8, 8, 4)
    assert 'conv_offset' in params


@pytest.mark.slow
@pytest.mark.parametrize('scale', [1.5, 30.0])
def test_row_windowed_sampler_matches_gather(scale):
    """The row-windowed Pallas path (DCN_ROW_WINDOW) at a geometry where it
    activates (hp_pad > window): small offsets take the windowed kernels,
    huge offsets (scale=30 -> tap span > window) must trigger the lax.cond
    fallback to the full-height kernels — both must equal the gather
    formulation in forward and all gradients."""
    import os
    from basicsr4rs_tpu.ops.dcn import _row_window
    os.environ['DCN_ROW_WINDOW'] = '24'  # default off (compile cost); test on
    try:
        assert _row_window() == 24
        rng = np.random.RandomState(11)
        h = w = 40  # hp_pad = 48 > 24-row window
        x = jnp.asarray(rng.rand(1, h, w, 4).astype(np.float32))
        wt = jnp.asarray(rng.rand(3, 3, 4, 4).astype(np.float32))
        offset = jnp.asarray(rng.randn(1, h, w, 2 * 9).astype(np.float32) * scale)
        mask = jnp.asarray(rng.rand(1, h, w, 9).astype(np.float32))

        def loss(method, x, offset, mask, wt):
            return jnp.sum(modulated_deform_conv(x, offset, mask, wt, None,
                                                 deform_groups=1,
                                                 method=method) ** 2)

        out_p = modulated_deform_conv(x, offset, mask, wt, None,
                                      deform_groups=1,
                                      method='pallas_interpret')
        out_g = modulated_deform_conv(x, offset, mask, wt, None,
                                      deform_groups=1, method='gather')
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_g),
                                   rtol=2e-5, atol=2e-5)

        g_p = jax.grad(lambda *a: loss('pallas_interpret', *a),
                       argnums=(0, 1, 2, 3))(x, offset, mask, wt)
        g_g = jax.grad(lambda *a: loss('gather', *a),
                       argnums=(0, 1, 2, 3))(x, offset, mask, wt)
        for a, b, name in zip(g_p, g_g, ['x', 'offset', 'mask', 'weight']):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4,
                                       err_msg=f'{name} grad mismatch')
    finally:
        os.environ.pop('DCN_ROW_WINDOW', None)


def test_kernel_knob_edge_cases():
    """Env-knob hygiene (r5 code review): zero/odd values must clamp or
    round, never crash or violate kernel alignment promises."""
    import os
    from basicsr4rs_tpu.ops.dcn import _bp_for, _row_window, _tap_chunks
    # DCN_TAP_CHUNK_FWD=0 clamps to a valid divisor instead of
    # ZeroDivisionError
    os.environ['DCN_TAP_CHUNK_FWD'] = '0'
    try:
        assert _tap_chunks(9, 'fwd', 512) == 1
    finally:
        del os.environ['DCN_TAP_CHUNK_FWD']
    # DCN_ROW_WINDOW rounds UP to a multiple of 8 (8-aligned window starts)
    os.environ['DCN_ROW_WINDOW'] = '20'
    try:
        assert _row_window() == 24
    finally:
        del os.environ['DCN_ROW_WINDOW']
    assert _row_window() == 0  # default off
    # wide geometries clamp pixels-per-cell to bound the VMEM working set
    assert _bp_for(66, 8) == 512      # EDVR L1: full default
    assert _bp_for(130, 64) == 128    # BasicVSR++-warp-wide: clamped
