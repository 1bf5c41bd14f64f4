import numpy as np
import pytest

from basicsr4rs_tpu.utils import bgr2ycbcr, rgb2ycbcr, ycbcr2rgb
from basicsr4rs_tpu.utils.img_util import crop_border, img2tensor, tensor2img


def test_rgb2ycbcr_matlab_values():
    # MATLAB: rgb2ycbcr([1 1 1]) = [235 128 128]/255; black = [16 128 128]/255
    white = np.ones((1, 1, 3), dtype=np.float32)
    black = np.zeros((1, 1, 3), dtype=np.float32)
    np.testing.assert_allclose(rgb2ycbcr(white) * 255, [[[235., 128., 128.]]], atol=1e-3)
    np.testing.assert_allclose(rgb2ycbcr(black) * 255, [[[16., 128., 128.]]], atol=1e-3)


def test_rgb_bgr_consistency():
    rng = np.random.RandomState(0)
    img = rng.rand(8, 8, 3).astype(np.float32)
    np.testing.assert_allclose(rgb2ycbcr(img, y_only=True), bgr2ycbcr(img[..., ::-1], y_only=True), atol=1e-6)


def test_ycbcr_roundtrip():
    rng = np.random.RandomState(0)
    img = rng.rand(8, 8, 3).astype(np.float64) * 0.8 + 0.1
    rec = ycbcr2rgb(rgb2ycbcr(img))
    np.testing.assert_allclose(rec, img, atol=1e-5)


def test_uint8_dtype_handling():
    img = np.array([[[255, 255, 255]]], dtype=np.uint8)
    out = rgb2ycbcr(img)
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, [[[235, 128, 128]]])


def test_img2tensor_tensor2img_roundtrip():
    rng = np.random.RandomState(0)
    bgr = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    rgb = img2tensor(bgr.astype(np.float32) / 255., bgr2rgb=True)
    assert rgb.shape == (16, 16, 3) and rgb.dtype == np.float32
    back = tensor2img(rgb, rgb2bgr=True)
    np.testing.assert_array_equal(back, bgr)


def test_tensor2img_batch_and_minmax():
    x = np.stack([np.zeros((4, 4, 3)), np.ones((4, 4, 3))])
    outs = tensor2img(x, min_max=(0, 1))
    assert isinstance(outs, list) and len(outs) == 2
    assert outs[0].max() == 0 and outs[1].min() == 255


def test_crop_border():
    x = np.ones((10, 10, 3))
    assert crop_border(x, 2).shape == (6, 6, 3)
    assert crop_border([x], 0)[0].shape == (10, 10, 3)
    batch = np.ones((2, 10, 10, 3))
    assert crop_border(batch, 1).shape == (2, 8, 8, 3)
