"""NIQE MATLAB-parity check on the anchor image
(reference: test_scripts/test_niqe.py; expected 5.7296)."""

import sys
from os import path as osp

import cv2

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))
from basicsr4rs_tpu.metrics import calculate_niqe  # noqa: E402

img = cv2.imread(osp.join(osp.dirname(__file__), '..', 'tests', 'data', 'baboon.png'))
score = calculate_niqe(img, crop_border=0)
print(f'NIQE(baboon.png) = {score:.6f} (MATLAB reference: 5.729571)')
assert abs(score - 5.7296) < 1e-3
