"""Host-side image transforms and RS normalizers.

Reference: basicsr/data/transforms.py. All functions operate on numpy HWC
arrays (our host convention); normalizers are numpy callables rather than
torch modules. Per-item randomness flows through an explicit
``numpy.random.Generator`` (the reference used the global ``random`` module;
explicit generators keep multiprocess loading reproducible).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import cv2
import numpy as np

ImgOrList = Union[np.ndarray, List[np.ndarray]]


def mod_crop(img: np.ndarray, scale: int) -> np.ndarray:
    """Crop H and W to multiples of ``scale`` (reference transforms.py:8)."""
    if img.ndim in (2, 3):
        h, w = img.shape[0], img.shape[1]
        h_r, w_r = h % scale, w % scale
        img = img[:h - h_r if h_r else h, :w - w_r if w_r else w, ...]
    else:
        raise ValueError(f'Wrong img ndim: {img.ndim}.')
    return img


def paired_random_crop(img_gts: ImgOrList,
                       img_lqs: ImgOrList,
                       gt_patch_size: int,
                       scale: int,
                       gt_path: str = '',
                       rng: Optional[np.random.Generator] = None) -> Tuple[ImgOrList, ImgOrList]:
    """Random aligned crop of GT/LQ pairs (reference transforms.py:28-95)."""
    rng = rng or np.random.default_rng()
    gt_is_list = isinstance(img_gts, list)
    lq_is_list = isinstance(img_lqs, list)
    gts = img_gts if gt_is_list else [img_gts]
    lqs = img_lqs if lq_is_list else [img_lqs]

    h_lq, w_lq = lqs[0].shape[0], lqs[0].shape[1]
    h_gt, w_gt = gts[0].shape[0], gts[0].shape[1]
    lq_patch_size = gt_patch_size // scale

    if h_gt != h_lq * scale or w_gt != w_lq * scale:
        raise ValueError(f'Scale mismatches. GT ({h_gt}, {w_gt}) is not {scale}x '
                         f'multiplication of LQ ({h_lq}, {w_lq}). Path: {gt_path}')
    if h_lq < lq_patch_size or w_lq < lq_patch_size:
        raise ValueError(f'LQ ({h_lq}, {w_lq}) is smaller than patch size '
                         f'({lq_patch_size}, {lq_patch_size}). Path: {gt_path}')

    top = int(rng.integers(0, h_lq - lq_patch_size + 1))
    left = int(rng.integers(0, w_lq - lq_patch_size + 1))

    lqs = [v[top:top + lq_patch_size, left:left + lq_patch_size, ...] for v in lqs]
    top_gt, left_gt = top * scale, left * scale
    gts = [v[top_gt:top_gt + gt_patch_size, left_gt:left_gt + gt_patch_size, ...] for v in gts]

    return (gts if gt_is_list else gts[0]), (lqs if lq_is_list else lqs[0])


def paired_central_crop(img_gts: ImgOrList,
                        img_lqs: ImgOrList,
                        gt_patch_size: int,
                        scale: int,
                        gt_path: str = '') -> Tuple[ImgOrList, ImgOrList]:
    """Central aligned crop (RS addition, reference transforms.py:98-165)."""
    gt_is_list = isinstance(img_gts, list)
    lq_is_list = isinstance(img_lqs, list)
    gts = img_gts if gt_is_list else [img_gts]
    lqs = img_lqs if lq_is_list else [img_lqs]

    h_lq, w_lq = lqs[0].shape[0], lqs[0].shape[1]
    lq_patch_size = gt_patch_size // scale
    top = (h_lq - lq_patch_size) // 2
    left = (w_lq - lq_patch_size) // 2

    lqs = [v[top:top + lq_patch_size, left:left + lq_patch_size, ...] for v in lqs]
    top_gt, left_gt = top * scale, left * scale
    gts = [v[top_gt:top_gt + gt_patch_size, left_gt:left_gt + gt_patch_size, ...] for v in gts]
    return (gts if gt_is_list else gts[0]), (lqs if lq_is_list else lqs[0])


def augment(imgs: ImgOrList,
            hflip: bool = True,
            rotation: bool = True,
            flows: Optional[ImgOrList] = None,
            return_status: bool = False,
            rng: Optional[np.random.Generator] = None):
    """Random hflip / vflip / rot90, flow-aware (reference transforms.py:168-232)."""
    rng = rng or np.random.default_rng()
    hflip = hflip and rng.random() < 0.5
    vflip = rotation and rng.random() < 0.5
    rot90 = rotation and rng.random() < 0.5

    def _augment(img):
        if hflip:
            img = img[:, ::-1, ...]
        if vflip:
            img = img[::-1, :, ...]
        if rot90:
            img = img.transpose(1, 0, 2) if img.ndim == 3 else img.transpose(1, 0)
        return np.ascontiguousarray(img)

    def _augment_flow(flow):
        if hflip:
            flow = flow[:, ::-1, :].copy()
            flow[:, :, 0] *= -1
        if vflip:
            flow = flow[::-1, :, :].copy()
            flow[:, :, 1] *= -1
        if rot90:
            flow = flow.transpose(1, 0, 2)
            flow = flow[:, :, [1, 0]]
        return np.ascontiguousarray(flow)

    single = not isinstance(imgs, list)
    out = [_augment(v) for v in (imgs if not single else [imgs])]
    out = out[0] if single else out

    if flows is not None:
        single_flow = not isinstance(flows, list)
        out_flows = [_augment_flow(v) for v in (flows if not single_flow else [flows])]
        out_flows = out_flows[0] if single_flow else out_flows
        if return_status:
            return out, out_flows, (hflip, vflip, rot90)
        return out, out_flows
    if return_status:
        return out, (hflip, vflip, rot90)
    return out


def img_rotate(img: np.ndarray, angle: float, center=None, scale: float = 1.0) -> np.ndarray:
    """Rotate around center (reference transforms.py:235-253)."""
    h, w = img.shape[:2]
    if center is None:
        center = ((w - 1) * 0.5, (h - 1) * 0.5)
    matrix = cv2.getRotationMatrix2D(center, angle, scale)
    return cv2.warpAffine(img, matrix, (w, h))


def chw2hwc(x: np.ndarray) -> np.ndarray:
    """(reference transforms.py:256)"""
    return np.ascontiguousarray(x.transpose(1, 2, 0))


def hwc2chw(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x.transpose(2, 0, 1))


def resize_hwc(array: np.ndarray, scale_factor: float) -> np.ndarray:
    """Nearest-neighbor per-channel resize of an HWC array
    (reference transforms.py:260-281; skimage there, cv2 here)."""
    h, w, c = array.shape
    out_h, out_w = int(h * scale_factor), int(w * scale_factor)
    return cv2.resize(array, (out_w, out_h), interpolation=cv2.INTER_NEAREST).reshape(out_h, out_w, c)


# ---------------------------------------------------------------------------
# RS (remote sensing) normalizers — numpy HWC callables.
# Reference: basicsr/data/transforms.py:285-340 (torch CHW there).
# ---------------------------------------------------------------------------

class SatNorm:
    """DN -> surface reflectance -> /max -> [-1, 1] (reference :285)."""

    def __init__(self, scale_to_sr: float, offset_to_sr: float, max_sr: float, band_num: int):
        self.scale_to_sr = scale_to_sr
        self.offset_to_sr = offset_to_sr
        self.max_sr = max_sr
        self.band_num = band_num

    def __call__(self, img: np.ndarray) -> np.ndarray:
        x = img.astype(np.float32) * self.scale_to_sr + self.offset_to_sr
        x = x / self.max_sr
        return x * 2.0 - 1.0  # (x - 0.5) / 0.5


class LandsatNorm(SatNorm):
    """Landsat Collection-2 L2 reflectance scaling (reference :305)."""

    def __init__(self, band_num: int, max_sr: float):
        super().__init__(scale_to_sr=0.0000275, offset_to_sr=-0.2, max_sr=max_sr, band_num=band_num)


class SentinelNorm(SatNorm):
    """Sentinel-2 L2A reflectance scaling (reference :310)."""

    def __init__(self, band_num: int, max_sr: float):
        super().__init__(scale_to_sr=0.0001, offset_to_sr=0.0, max_sr=max_sr, band_num=band_num)


class Mean2StdNormalize:
    """Map mean ± 1*std per band to [-1, 1] with clamping (reference :321)."""

    def __init__(self, mean: Sequence[float], std: Sequence[float]):
        self.mean = np.asarray(mean, dtype=np.float32).reshape(1, 1, -1)
        self.std = np.asarray(std, dtype=np.float32).reshape(1, 1, -1)

    def __call__(self, img: np.ndarray) -> np.ndarray:
        if img.shape[-1] != self.mean.shape[-1]:
            raise ValueError(f'Expected {self.mean.shape[-1]} channels, but got {img.shape[-1]}')
        min_value = self.mean - self.std
        max_value = self.mean + self.std
        normalized = 2 * (img - min_value) / (max_value - min_value) - 1
        return np.clip(normalized, -1.0, 1.0)


def build_normalizer(source_dict: dict, bands: Sequence[str]) -> Mean2StdNormalize:
    """Per-band mean/std dict -> normalizer (reference transforms.py:316)."""
    mean = [source_dict[band]['mean'] for band in bands]
    std = [source_dict[band]['std'] for band in bands]
    return Mean2StdNormalize(mean=mean, std=std)
