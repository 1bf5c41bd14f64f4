"""PSNR/SSIM tests.

Golden values were computed by executing the reference implementation
(basicsr/metrics/psnr_ssim.py) on the same seeded inputs; see the parity
protocol in SURVEY.md §4.
"""

import numpy as np
import pytest

from basicsr4rs_tpu.metrics import (calculate_psnr, calculate_psnr_band, calculate_psnr_jax,
                                    calculate_ssim, calculate_ssim_band, calculate_ssim_jax)


def _pair():
    rng = np.random.RandomState(1)
    a = (rng.rand(64, 64, 3) * 255).astype(np.uint8).astype(np.float64)
    b = np.clip(a + rng.randn(64, 64, 3) * 10, 0, 255)
    return a, b


# (test_y_channel, crop_border) -> (psnr, ssim), produced by the reference
# implementation on _pair() inputs.
GOLDEN = {
    (False, 0): (28.27428111, 0.99055913),
    (False, 4): (28.23627652, 0.99052615),
    (True, 0): (33.23845044, 0.99094037),
    (True, 4): (33.18900481, 0.99070934),
}


@pytest.mark.parametrize('ych,cb', list(GOLDEN.keys()))
def test_psnr_ssim_reference_parity(ych, cb):
    a, b = _pair()
    p_gold, s_gold = GOLDEN[(ych, cb)]
    assert calculate_psnr(a, b, crop_border=cb, test_y_channel=ych) == pytest.approx(p_gold, abs=1e-6)
    assert calculate_ssim(a, b, crop_border=cb, test_y_channel=ych) == pytest.approx(s_gold, abs=1e-6)


def test_psnr_identical_is_inf():
    a, _ = _pair()
    assert calculate_psnr(a, a, crop_border=0) == float('inf')


def test_shape_mismatch_raises():
    a, b = _pair()
    with pytest.raises(AssertionError):
        calculate_psnr(a, b[:32], crop_border=0)


def test_band_variants():
    a, b = _pair()
    p = calculate_psnr_band(a, b, crop_border=0, band=1)
    full = calculate_psnr(a[..., 1:2], b[..., 1:2], crop_border=0)
    assert p == pytest.approx(full)
    s = calculate_ssim_band(a, b, crop_border=0, band=2)
    assert 0 < s < 1


def test_jax_variants_match_numpy():
    import jax.numpy as jnp
    a, b = _pair()
    a01 = (a / 255.).astype(np.float32)[None]
    b01 = (b / 255.).astype(np.float32)[None]
    pj = float(np.asarray(calculate_psnr_jax(jnp.array(a01), jnp.array(b01), 4))[0])
    sj = float(np.asarray(calculate_ssim_jax(jnp.array(a01), jnp.array(b01), 4))[0])
    assert pj == pytest.approx(calculate_psnr(a, b, crop_border=4), abs=1e-2)
    assert sj == pytest.approx(calculate_ssim(a, b, crop_border=4), abs=1e-3)


def test_pt_and_jax_registry_names_resolve():
    """Reference configs naming calculate_psnr_pt / calculate_ssim_pt (and
    the device _jax aliases) must build through the registry and agree with
    the numpy ground truth (VERDICT r2 #7)."""
    from basicsr4rs_tpu.metrics import calculate_metric
    from basicsr4rs_tpu.utils.registry import METRIC_REGISTRY
    for name in ('calculate_psnr_pt', 'calculate_ssim_pt',
                 'calculate_psnr_jax', 'calculate_ssim_jax'):
        assert name in METRIC_REGISTRY

    a, b = _pair()
    # uint8 HWC inputs (the tensor2img form) are coerced on device
    p = calculate_metric({'img': a.astype(np.uint8), 'img2': b.astype(np.uint8)},
                         {'type': 'calculate_psnr_pt', 'crop_border': 4})
    s = calculate_metric({'img': a.astype(np.uint8), 'img2': b.astype(np.uint8)},
                         {'type': 'calculate_ssim_pt', 'crop_border': 4})
    assert isinstance(p, float) and isinstance(s, float)
    assert p == pytest.approx(calculate_psnr(a, b, crop_border=4), abs=1e-2)
    assert s == pytest.approx(calculate_ssim(a, b, crop_border=4), abs=1e-3)

    # NHWC [0,1] device batches (the validation-path form)
    import jax.numpy as jnp
    a01 = jnp.asarray((a / 255.).astype(np.float32)[None])
    b01 = jnp.asarray((b / 255.).astype(np.float32)[None])
    p2 = calculate_metric({'img': a01, 'img2': b01},
                          {'type': 'calculate_psnr_jax', 'crop_border': 4})
    assert p2 == pytest.approx(calculate_psnr(a, b, crop_border=4), abs=1e-2)


def test_pt_y_channel_bgr_convention():
    """Y-channel parity between the numpy path (BGR uint8 from tensor2img,
    bgr2ycbcr) and the device _pt wrappers, which must flip the uint8 BGR
    input to RGB before rgb2ycbcr — a silent Y-mismatch otherwise (the
    luma weights are asymmetric in R and B)."""
    from basicsr4rs_tpu.metrics import calculate_metric
    a, b = _pair()
    gold_p = calculate_psnr(a, b, crop_border=4, test_y_channel=True)
    gold_s = calculate_ssim(a, b, crop_border=4, test_y_channel=True)
    data = {'img': a.astype(np.uint8), 'img2': b.astype(np.uint8)}
    p = calculate_metric(data, {'type': 'calculate_psnr_pt', 'crop_border': 4,
                                'test_y_channel': True})
    s = calculate_metric(data, {'type': 'calculate_ssim_pt', 'crop_border': 4,
                                'test_y_channel': True})
    assert p == pytest.approx(gold_p, abs=5e-2)
    assert s == pytest.approx(gold_s, abs=1e-3)

    # RGB float inputs (the reference _pt tensor convention) must NOT be
    # flipped: Y from rgb2ycbcr directly.
    import jax.numpy as jnp
    a01 = jnp.asarray((a[..., ::-1] / 255.).astype(np.float32)[None])  # RGB
    b01 = jnp.asarray((b[..., ::-1] / 255.).astype(np.float32)[None])
    p2 = calculate_metric({'img': a01, 'img2': b01},
                          {'type': 'calculate_psnr_pt', 'crop_border': 4,
                           'test_y_channel': True})
    assert p2 == pytest.approx(gold_p, abs=5e-2)
