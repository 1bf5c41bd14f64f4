"""Batched tiled inference.

The reference handles huge inputs with a sequential per-tile loop inside the
inference scripts; on TPU the same memory bound is better served by
space-to-batch: all tiles are extracted into ONE uniform batch and run
through a single jitted forward (v5e conv throughput more than doubles in
the many-tiles/small-spatial regime — see bench.py), then the upscaled
cores are stitched back.

Window placement is edge-anchored: every window lies fully inside the image
(shifted inward at the borders), so edge windows terminate at the TRUE image
boundary and the model's own padding semantics apply there. For CNNs the
result is therefore exact everywhere once ``tile_pad`` covers the receptive
field; window-attention models match the reference's tile-mode semantics
(tiling intrinsically perturbs global attention).
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp


def tiled_apply(fn: Callable, lq: jnp.ndarray, scale: int, tile_size: int,
                tile_pad: int = 16) -> jnp.ndarray:
    """Apply ``fn`` (NHWC -> NHWC, xscale) to ``lq`` as one batch of tiles.

    Args:
      fn: jittable forward over a tile batch.
      lq: (N, H, W, C) input.
      scale: spatial upscale factor of ``fn``.
      tile_size: core tile size (input pixels).
      tile_pad: halo around each core (input pixels); cover the receptive
        field for exactness.
    Returns: (N, H*scale, W*scale, C_out).
    """
    n, h, w, c = lq.shape
    full = tile_size + 2 * tile_pad
    if full >= h or full >= w:
        return fn(lq)

    def axis_plan(extent):
        """(window_start, core_start, core_len) per tile along one axis."""
        plan = []
        num = math.ceil(extent / tile_size)
        for i in range(num):
            core0 = i * tile_size
            core_len = min(tile_size, extent - core0)
            win0 = min(max(core0 - tile_pad, 0), extent - full)
            plan.append((win0, core0 - win0, core_len))
        return plan

    rows = axis_plan(h)
    cols = axis_plan(w)

    tiles = [lq[:, wy:wy + full, wx:wx + full, :]
             for wy, _, _ in rows for wx, _, _ in cols]
    out = fn(jnp.concatenate(tiles, axis=0))
    out = out.reshape(len(rows), len(cols), n, full * scale, full * scale, -1)

    s = scale
    row_strips = []
    for ri, (_, oy, ly) in enumerate(rows):
        strip = [out[ri, ci, :, oy * s:(oy + ly) * s, ox * s:(ox + lx) * s, :]
                 for ci, (_, ox, lx) in enumerate(cols)]
        row_strips.append(jnp.concatenate(strip, axis=2))
    return jnp.concatenate(row_strips, axis=1)
