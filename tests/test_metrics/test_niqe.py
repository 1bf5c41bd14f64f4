"""NIQE MATLAB-parity test (reference anchor: baboon.png -> 5.7296,
basicsr/metrics/niqe.py:186-188 / test_scripts/test_niqe.py)."""

import os

import cv2
import numpy as np
import pytest

from basicsr4rs_tpu.metrics import calculate_niqe, calculate_niqe_none

BABOON = os.path.join(os.path.dirname(__file__), '..', 'data', 'baboon.png')


@pytest.mark.skipif(not os.path.isfile(BABOON), reason='baboon.png test asset missing')
def test_niqe_matlab_parity():
    img = cv2.imread(BABOON).astype(np.float64)
    val = calculate_niqe(img, crop_border=0)
    assert val == pytest.approx(5.7296, abs=2e-4)


def test_niqe_on_noise_is_high():
    rng = np.random.RandomState(0)
    img = (rng.rand(256, 256, 3) * 255).astype(np.float64)
    val = calculate_niqe(img, crop_border=0)
    assert val > 8  # pure noise is far from pristine statistics


def test_niqe_none_stub():
    assert calculate_niqe_none() == -1
