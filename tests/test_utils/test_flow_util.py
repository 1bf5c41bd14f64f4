"""flow_util round-trip tests."""

import numpy as np
import pytest

from basicsr4rs_tpu.utils.flow_util import (dequantize, dequantize_flow, flowread,
                                            flowwrite, quantize, quantize_flow)


def test_flo_roundtrip(tmp_path):
    flow = np.random.RandomState(0).randn(12, 10, 2).astype(np.float32)
    path = str(tmp_path / 'a.flo')
    flowwrite(flow, path)
    got = flowread(path)
    np.testing.assert_array_equal(got, flow)


def test_flo_bad_header(tmp_path):
    path = str(tmp_path / 'bad.flo')
    with open(path, 'wb') as f:
        f.write(b'XXXX')
    with pytest.raises(IOError):
        flowread(path)


def test_quantize_roundtrip():
    flow = np.random.RandomState(1).uniform(-0.015, 0.015, (8, 6, 2))
    dx, dy = quantize_flow(flow, max_val=0.02, norm=False)
    assert dx.dtype == np.uint8
    rec = dequantize_flow(dx, dy, max_val=0.02, denorm=False)
    # 255 levels over [-0.02, 0.02]: max error = half a bin
    assert np.abs(rec - flow).max() <= 0.04 / 255 / 2 + 1e-9


def test_quantize_zero_is_exact():
    # 255 (odd) levels: 0 must map back to 0 exactly
    z = np.zeros((4, 4))
    q = quantize(z, -0.02, 0.02, 255, np.uint8)
    back = dequantize(q, -0.02, 0.02, 255)
    np.testing.assert_allclose(back, 0, atol=1e-12)


def test_quantize_validation():
    with pytest.raises(ValueError):
        quantize(np.zeros(3), 0, 1, 1)
    with pytest.raises(ValueError):
        dequantize(np.zeros(3), 1, 0, 255)


def test_quantized_image_roundtrip(tmp_path):
    flow = np.random.RandomState(2).uniform(-0.01, 0.01, (8, 8, 2))
    path = str(tmp_path / 'sub' / 'q.png')
    flowwrite(flow, path, quantize=True, norm=False)
    got = flowread(path, quantize=True, denorm=False)
    assert got.shape == (8, 8, 2)
    assert np.abs(got - flow).max() < 0.04 / 255
