"""Image <-> array conversion utilities.

Reference: basicsr/utils/img_util.py. Layout convention differs by design:
the reference is torch/NCHW; this framework is **NHWC end to end** (the
TPU-native layout — channels on the 128-lane minor dimension). Host-side
images are numpy HWC RGB float32 in [0, 1]; device batches are NHWC.
``tensor2img`` accepts NHWC/HWC jax or numpy arrays and emits uint8 HWC BGR
for cv2 I/O, matching the reference's output convention so saved images are
byte-identical.
"""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple, Union

import cv2
import numpy as np


def img2tensor(imgs, bgr2rgb: bool = True, float32: bool = True):
    """BGR uint8/float HWC (cv2 convention) -> RGB float32 HWC arrays.

    Unlike the reference (img_util.py:11-37) we stay HWC: the model stack is
    NHWC. Name kept for config/API parity.
    """

    def _totensor(img):
        if img.ndim == 2:
            img = img[:, :, None]
        if img.shape[2] == 3 and bgr2rgb:
            if img.dtype == np.float64:
                img = img.astype(np.float32)
            img = img[:, :, ::-1]
        img = np.ascontiguousarray(img)
        if float32:
            img = img.astype(np.float32)
        return img

    if isinstance(imgs, list):
        return [_totensor(img) for img in imgs]
    return _totensor(imgs)


def tensor2img(tensor,
               rgb2bgr: bool = True,
               out_type=np.uint8,
               min_max: Tuple[float, float] = (0, 1)):
    """Device array(s) -> uint8 (or float) HWC BGR numpy image(s).

    Accepts a single array or list of arrays, each NHWC (batch folded into a
    grid is NOT done — batches are split), HWC, or HW. Mirrors the reference
    contract (img_util.py:40-96): clamp to ``min_max``, rescale to [0, 1],
    RGB->BGR, x255 round for uint8.
    """
    single_input = not isinstance(tensor, (list, tuple))
    tensors = [tensor] if single_input else list(tensor)
    result = []
    for t in tensors:
        arr = np.asarray(t).astype(np.float32)
        arr = np.clip(arr, min_max[0], min_max[1])
        arr = (arr - min_max[0]) / (min_max[1] - min_max[0])
        if arr.ndim == 4:
            imgs = [arr[i] for i in range(arr.shape[0])]
        else:
            imgs = [arr]
        for img in imgs:
            if img.ndim == 2:
                img = img[:, :, None]
            if img.shape[2] == 3 and rgb2bgr:
                img = img[:, :, ::-1]
            elif img.shape[2] == 1:
                img = img[:, :, 0]
            if out_type == np.uint8:
                img = (img * 255.0).round()
            img = img.astype(out_type)
            result.append(img)
    if single_input and len(result) == 1:
        return result[0]
    return result


def minusone_one_tensor_to_ubyte_numpy(tensor, rgb2bgr: bool = True):
    """RS convention: arrays in [-1, 1] -> uint8 images (reference
    img_util.py:99-145)."""
    return tensor2img(tensor, rgb2bgr=rgb2bgr, out_type=np.uint8, min_max=(-1, 1))


def imfrombytes(content: bytes, flag: str = 'color', float32: bool = False) -> np.ndarray:
    """Decode image bytes (reference img_util.py:148-166)."""
    img_np = np.frombuffer(content, np.uint8)
    imread_flags = {
        'color': cv2.IMREAD_COLOR,
        'grayscale': cv2.IMREAD_GRAYSCALE,
        'unchanged': cv2.IMREAD_UNCHANGED,
    }
    img = cv2.imdecode(img_np, imread_flags[flag])
    if float32:
        img = img.astype(np.float32) / 255.
    return img


def imwrite(img: np.ndarray, file_path: str, params=None, auto_mkdir: bool = True) -> None:
    """cv2.imwrite with parent-dir creation (reference img_util.py:169-190)."""
    if auto_mkdir:
        dir_name = os.path.abspath(os.path.dirname(file_path))
        os.makedirs(dir_name, exist_ok=True)
    ok = cv2.imwrite(file_path, img, params or [])
    if not ok:
        raise IOError('Failed in writing images.')


def crop_border(imgs, crop_border: int):
    """Crop ``crop_border`` pixels from each spatial edge (reference
    img_util.py:251-267). Works on HWC / NHWC arrays or lists thereof."""
    if crop_border == 0:
        return imgs

    def _crop(img):
        if img.ndim == 4:
            return img[:, crop_border:-crop_border, crop_border:-crop_border, ...]
        return img[crop_border:-crop_border, crop_border:-crop_border, ...]

    if isinstance(imgs, list):
        return [_crop(v) for v in imgs]
    return _crop(imgs)


def rgb_nir_split(img: np.ndarray) -> List[np.ndarray]:
    """Split a >=4-band HWC image into 3-band groups for visualization
    (RS convention, reference srrs_model.py ``rswrite``)."""
    bands = img.shape[2]
    groups = []
    for start in range(0, bands, 3):
        g = img[:, :, start:start + 3]
        if g.shape[2] < 3:
            g = np.repeat(g[:, :, :1], 3, axis=2)
        groups.append(g)
    return groups
