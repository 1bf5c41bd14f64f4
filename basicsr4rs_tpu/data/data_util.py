"""Dataset path/index helpers (reference: basicsr/data/data_util.py)."""

from __future__ import annotations

from os import path as osp
from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np

from ..utils.img_util import imfrombytes, img2tensor
from ..utils.misc import scandir


def read_img_seq(path, require_mod_crop: bool = False, scale: int = 1,
                 return_imgname: bool = False):
    """Read a frame folder into a (T, H, W, C) float32 RGB array
    (reference data_util.py:11-40; THWC here instead of TCHW)."""
    from .transforms import mod_crop
    if isinstance(path, list):
        img_paths = path
    else:
        img_paths = sorted(list(scandir(path, full_path=True)))
    imgs = [cv2.imread(v).astype(np.float32) / 255. for v in img_paths]

    if require_mod_crop:
        imgs = [mod_crop(img, scale) for img in imgs]
    imgs = [img2tensor(img, bgr2rgb=True, float32=True) for img in imgs]
    imgs = np.stack(imgs, axis=0)

    if return_imgname:
        imgnames = [osp.splitext(osp.basename(path))[0] for path in img_paths]
        return imgs, imgnames
    return imgs


def generate_frame_indices(crt_idx: int,
                           max_frame_num: int,
                           num_frames: int,
                           padding: str = 'reflection') -> List[int]:
    """Temporal window indices with border padding
    (reference data_util.py:43-92). Padding modes for a window centered at
    ``crt_idx`` (0-based, ``max_frame_num`` frames total):

    replicate:          [0, 0, 0, 1, 2]
    reflection:         [2, 1, 0, 1, 2]
    reflection_circle:  [4, 3, 0, 1, 2]
    circle:             [3, 4, 0, 1, 2]
    """
    assert num_frames % 2 == 1, 'num_frames should be an odd number.'
    assert padding in ('replicate', 'reflection', 'reflection_circle', 'circle'), f'Wrong padding mode: {padding}.'

    max_frame_num = max_frame_num - 1  # start from 0
    num_pad = num_frames // 2

    indices = []
    for i in range(crt_idx - num_pad, crt_idx + num_pad + 1):
        if i < 0:
            if padding == 'replicate':
                pad_idx = 0
            elif padding == 'reflection':
                pad_idx = -i
            elif padding == 'reflection_circle':
                pad_idx = crt_idx + num_pad - i
            else:
                pad_idx = num_frames + i
        elif i > max_frame_num:
            if padding == 'replicate':
                pad_idx = max_frame_num
            elif padding == 'reflection':
                pad_idx = max_frame_num * 2 - i
            elif padding == 'reflection_circle':
                pad_idx = (crt_idx - num_pad) - (i - max_frame_num)
            else:
                pad_idx = i - num_frames
        else:
            pad_idx = i
        indices.append(pad_idx)
    return indices


def paired_paths_from_lmdb(folders: Sequence[str], keys: Sequence[str]) -> List[dict]:
    """Paired keys from two lmdb meta files (reference data_util.py:95-153)."""
    assert len(folders) == 2, f'The len of folders should be 2 with [input_folder, gt_folder]. But got {len(folders)}'
    assert len(keys) == 2, f'The len of keys should be 2 with [input_key, gt_key]. But got {len(keys)}'
    input_folder, gt_folder = folders
    input_key, gt_key = keys

    if not (input_folder.endswith('.lmdb') and gt_folder.endswith('.lmdb')):
        raise ValueError(f'{input_key} folder and {gt_key} folder should both in lmdb '
                         f'formats. But received {input_key}: {input_folder}; {gt_key}: {gt_folder}')
    with open(osp.join(input_folder, 'meta_info.txt')) as fin:
        input_lmdb_keys = [line.split('.')[0] for line in fin]
    with open(osp.join(gt_folder, 'meta_info.txt')) as fin:
        gt_lmdb_keys = [line.split('.')[0] for line in fin]
    if set(input_lmdb_keys) != set(gt_lmdb_keys):
        raise ValueError(f'Keys in {input_key}_folder and {gt_key}_folder are different.')
    paths = []
    for lmdb_key in sorted(input_lmdb_keys):
        paths.append(dict([(f'{input_key}_path', lmdb_key), (f'{gt_key}_path', lmdb_key)]))
    return paths


def paired_paths_from_meta_info_file(folders: Sequence[str], keys: Sequence[str],
                                     meta_info_file: str, filename_tmpl: str) -> List[dict]:
    """Paired paths from a GT meta file + filename template
    (reference data_util.py:156-197)."""
    assert len(folders) == 2 and len(keys) == 2
    input_folder, gt_folder = folders
    input_key, gt_key = keys

    with open(meta_info_file, 'r') as fin:
        gt_names = [line.strip().split(' ')[0] for line in fin]

    paths = []
    for gt_name in gt_names:
        basename, ext = osp.splitext(osp.basename(gt_name))
        input_name = f'{filename_tmpl.format(basename)}{ext}'
        input_path = osp.join(input_folder, input_name)
        gt_path = osp.join(gt_folder, gt_name)
        paths.append(dict([(f'{input_key}_path', input_path), (f'{gt_key}_path', gt_path)]))
    return paths


def paired_paths_from_folder(folders: Sequence[str], keys: Sequence[str],
                             filename_tmpl: str) -> List[dict]:
    """Paired paths by scanning two folders (reference data_util.py:200-241)."""
    assert len(folders) == 2 and len(keys) == 2
    input_folder, gt_folder = folders
    input_key, gt_key = keys

    input_paths = list(scandir(input_folder))
    gt_paths = list(scandir(gt_folder))
    assert len(input_paths) == len(gt_paths), (f'{input_key} and {gt_key} datasets have different number of images: '
                                               f'{len(input_paths)}, {len(gt_paths)}.')
    paths = []
    for gt_path in sorted(gt_paths):
        basename, ext = osp.splitext(osp.basename(gt_path))
        input_name = f'{filename_tmpl.format(basename)}{ext}'
        input_path = osp.join(input_folder, input_name)
        assert input_name in [osp.basename(p) for p in input_paths], f'{input_name} is not in {input_key}_paths.'
        gt_path = osp.join(gt_folder, gt_path)
        paths.append(dict([(f'{input_key}_path', input_path), (f'{gt_key}_path', gt_path)]))
    return paths


def paths_from_folder(folder: str) -> List[str]:
    """(reference data_util.py:244-256)"""
    return [osp.join(folder, p) for p in list(scandir(folder))]


def paths_from_lmdb(folder: str) -> List[str]:
    """(reference data_util.py:259-274)"""
    if not folder.endswith('.lmdb'):
        raise ValueError(f'Folder {folder} should be in lmdb format.')
    with open(osp.join(folder, 'meta_info.txt')) as fin:
        return [line.split('.')[0] for line in fin]


def generate_gaussian_kernel(kernel_size: int = 13, sigma: float = 1.6) -> np.ndarray:
    """Gaussian filter obtained by smoothing a dirac delta — exactly the DUF
    official construction (reference data_util.py:277-283)."""
    from scipy.ndimage import gaussian_filter
    kernel = np.zeros((kernel_size, kernel_size))
    kernel[kernel_size // 2, kernel_size // 2] = 1
    return gaussian_filter(kernel, sigma)


def duf_downsample(x: np.ndarray, kernel_size: int = 13, scale: int = 4) -> np.ndarray:
    """DUF protocol downsampling: reflect pad (k//2 + 2*scale), Gaussian
    blur (sigma = 0.4*scale), valid conv with stride=scale, crop 2 border
    samples (reference data_util.py:285-315, torch conv there).

    Args:
        x: (T, H, W, C) or (H, W, C) float array.
    """
    assert scale in (2, 3, 4), f'Only support scale (2, 3, 4), but got {scale}.'
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    pad = kernel_size // 2 + scale * 2
    half = kernel_size // 2
    kernel = generate_gaussian_kernel(kernel_size, 0.4 * scale)
    t = x.shape[0]
    out = []
    for i in range(t):
        frame = np.pad(x[i], ((pad, pad), (pad, pad), (0, 0)), mode='reflect')
        blurred = cv2.filter2D(frame, -1, kernel, borderType=cv2.BORDER_CONSTANT)
        if blurred.ndim == 2:
            blurred = blurred[:, :, None]
        # Valid-conv positions of the padded frame, strided by `scale`.
        valid = blurred[half:frame.shape[0] - half:scale, half:frame.shape[1] - half:scale]
        out.append(valid[2:-2, 2:-2])
    out = np.stack(out, axis=0)
    return out[0] if squeeze else out
