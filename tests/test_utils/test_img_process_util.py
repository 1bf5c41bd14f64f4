"""filter2D / sep_filter2d / USMSharp unit tests
(reference: basicsr/utils/img_process_util.py:7-100)."""

import cv2
import jax.numpy as jnp
import numpy as np

from basicsr4rs_tpu.utils.img_process_util import (USMSharp, filter2D,
                                                   sep_filter2d, usm_sharp)


def test_filter2d_matches_scipy_reflect():
    rng = np.random.RandomState(0)
    img = rng.rand(2, 17, 19, 3).astype(np.float32)
    ker = rng.rand(2, 5, 5).astype(np.float32)
    out = np.asarray(filter2D(jnp.asarray(img), jnp.asarray(ker)))
    assert out.shape == img.shape
    # hand-rolled correlation with reflect padding at one probe point
    n, i, j, c = 1, 8, 9, 1
    p = np.pad(img[n, :, :, c], 2, mode='reflect')
    expect = float((p[i:i + 5, j:j + 5] * ker[n]).sum())
    np.testing.assert_allclose(out[n, i, j, c], expect, rtol=1e-5)


def test_sep_filter2d_equals_dense_gaussian():
    """The separable USM path must match the dense outer-product filtering."""
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.rand(3, 24, 28, 3).astype(np.float32))
    k1 = cv2.getGaussianKernel(51, 0)
    dense = filter2D(img, jnp.asarray(np.outer(k1, k1), jnp.float32))
    sep = sep_filter2d(img, jnp.asarray(k1[:, 0], jnp.float32))
    np.testing.assert_allclose(np.asarray(sep), np.asarray(dense),
                               rtol=1e-5, atol=1e-6)


def test_usm_sharp_matches_torch_reference():
    """Numeric parity with the reference sharpeners (img_process_util.py:7-80):
    threshold mask, Gaussian blur, soft-mask blend."""
    import sys
    from os import path as osp
    sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))
    import torch
    from ref_loader import load_ref_module
    ref = load_ref_module('basicsr/utils/img_process_util.py')
    from basicsr4rs_tpu.utils.img_process_util import USMSharp, usm_sharp
    rng = np.random.RandomState(0)

    img = rng.rand(64, 64, 3).astype(np.float32)
    want = ref.usm_sharp(img.copy(), weight=0.5, radius=51, threshold=10)
    got = np.asarray(usm_sharp(jnp.asarray(img)[None], weight=0.5, radius=51,
                               threshold=10))[0]
    np.testing.assert_allclose(got, want, atol=2e-6)

    x = rng.rand(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want_b = ref.USMSharp()(torch.from_numpy(x)).numpy()
    got_b = np.asarray(USMSharp()(jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got_b.transpose(0, 3, 1, 2), want_b, atol=2e-6)


def test_usm_sharp_class_and_fn_agree():
    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    a = np.asarray(USMSharp()(img))
    b = np.asarray(usm_sharp(img))
    np.testing.assert_array_equal(a, b)
    assert a.min() >= 0 and a.max() <= 1
    # sharpening changes the image
    assert np.abs(a - np.asarray(img)).max() > 1e-4
