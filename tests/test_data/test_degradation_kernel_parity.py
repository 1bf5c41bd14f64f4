"""Blur-kernel synthesis parity vs the reference (degradations.py:84-420):
(an)isotropic / generalized Gaussian / plateau PDFs and the sinc low-pass —
bit-exact, both are float64 numpy."""

import sys
from os import path as osp

import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))
from ref_loader import load_ref_module  # noqa: E402

from basicsr4rs_tpu.data import degradations as ours  # noqa: E402


@pytest.mark.parametrize('fn,args', [
    ('bivariate_Gaussian', (21, 2.0, 3.0, 0.6)),
    ('bivariate_Gaussian', (13, 0.8, 0.8, 0.0)),
    ('bivariate_generalized_Gaussian', (21, 2.0, 3.0, 0.6, 1.5)),
    ('bivariate_generalized_Gaussian', (21, 2.0, 3.0, -0.4, 0.7)),
    ('bivariate_plateau', (21, 2.0, 3.0, 0.6, 1.5)),
    ('circular_lowpass_kernel', (np.pi / 3, 21)),
    ('circular_lowpass_kernel', (np.pi / 2, 13)),
])
def test_kernel_synthesis_bitexact(fn, args):
    ref = load_ref_module('basicsr/data/degradations.py')
    want = getattr(ref, fn)(*args)
    got = np.asarray(getattr(ours, fn)(*args))
    np.testing.assert_array_equal(got, want)
