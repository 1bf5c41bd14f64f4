"""Optical-flow IO: Middlebury ``.flo`` files and jpeg-quantized pairs
(reference: basicsr/utils/flow_util.py:7-173; the format itself is the
standard mmcv/Middlebury convention)."""

from __future__ import annotations

import os

import numpy as np

_FLO_MAGIC = 'PIEH'


def flowread(flow_path, quantize: bool = False, concat_axis: int = 0, *args, **kwargs):
    """Read a flow map as an (h, w, 2) float32 array. With ``quantize`` the
    file is an image holding dx/dy stacked along ``concat_axis``."""
    if quantize:
        import cv2
        assert concat_axis in (0, 1)
        cat_flow = cv2.imread(flow_path, cv2.IMREAD_UNCHANGED)
        if cat_flow.ndim != 2:
            raise IOError(f'{flow_path} is not a valid quantized flow file, '
                          f'its dimension is {cat_flow.ndim}.')
        assert cat_flow.shape[concat_axis] % 2 == 0
        dx, dy = np.split(cat_flow, 2, axis=concat_axis)
        flow = dequantize_flow(dx, dy, *args, **kwargs)
    else:
        with open(flow_path, 'rb') as f:
            try:
                header = f.read(4).decode('utf-8')
            except Exception:
                raise IOError(f'Invalid flow file: {flow_path}')
            if header != _FLO_MAGIC:
                raise IOError(f'Invalid flow file: {flow_path}, '
                              'header does not contain PIEH')
            w = int(np.fromfile(f, np.int32, 1).squeeze())
            h = int(np.fromfile(f, np.int32, 1).squeeze())
            flow = np.fromfile(f, np.float32, w * h * 2).reshape((h, w, 2))
    return flow.astype(np.float32)


def flowwrite(flow, filename, quantize: bool = False, concat_axis: int = 0,
              *args, **kwargs):
    """Write flow losslessly (``.flo``) or as a quantized jpeg pair."""
    if not quantize:
        with open(filename, 'wb') as f:
            f.write(_FLO_MAGIC.encode('utf-8'))
            np.array([flow.shape[1], flow.shape[0]], np.int32).tofile(f)
            flow.astype(np.float32).tofile(f)
            f.flush()
    else:
        import cv2
        assert concat_axis in (0, 1)
        dx, dy = quantize_flow(flow, *args, **kwargs)
        dxdy = np.concatenate((dx, dy), axis=concat_axis)
        os.makedirs(os.path.dirname(filename), exist_ok=True)
        cv2.imwrite(filename, dxdy)


def quantize_flow(flow, max_val: float = 0.02, norm: bool = True):
    """Quantize dx/dy to uint8 (255 levels so 0 round-trips exactly)."""
    h, w, _ = flow.shape
    dx, dy = flow[..., 0], flow[..., 1]
    if norm:
        dx = dx / w
        dy = dy / h
    return tuple(quantize(d, -max_val, max_val, 255, np.uint8) for d in (dx, dy))


def dequantize_flow(dx, dy, max_val: float = 0.02, denorm: bool = True):
    """Invert :func:`quantize_flow`."""
    assert dx.shape == dy.shape
    assert dx.ndim == 2 or (dx.ndim == 3 and dx.shape[-1] == 1)
    dx, dy = (dequantize(d, -max_val, max_val, 255) for d in (dx, dy))
    if denorm:
        dx *= dx.shape[1]
        dy *= dx.shape[0]
    return np.dstack((dx, dy))


def quantize(arr, min_val, max_val, levels: int, dtype=np.int64):
    """Map (-inf, inf) -> integer bins [0, levels-1]."""
    if not (isinstance(levels, int) and levels > 1):
        raise ValueError(f'levels must be a positive integer, but got {levels}')
    if min_val >= max_val:
        raise ValueError(f'min_val ({min_val}) must be smaller than max_val ({max_val})')
    arr = np.clip(arr, min_val, max_val) - min_val
    return np.minimum(np.floor(levels * arr / (max_val - min_val)).astype(dtype), levels - 1)


def dequantize(arr, min_val, max_val, levels: int, dtype=np.float64):
    """Map integer bins back to bin centers in [min_val, max_val]."""
    if not (isinstance(levels, int) and levels > 1):
        raise ValueError(f'levels must be a positive integer, but got {levels}')
    if min_val >= max_val:
        raise ValueError(f'min_val ({min_val}) must be smaller than max_val ({max_val})')
    return (arr + 0.5).astype(dtype) * (max_val - min_val) / levels + min_val
