"""Multi-host / multi-device topology helpers.

TPU-native replacement for the reference's torch.distributed/NCCL layer
(reference: basicsr/utils/dist_util.py:10-82). On TPU, collective
communication is compiled into the program by XLA from sharding annotations,
so there is no NCCL-style process-group plumbing here: the only runtime state
is the JAX process index/count (multi-host) and the global device list.

- reference ``init_dist(launcher)``        -> :func:`init_dist` (calls
  ``jax.distributed.initialize`` when a multi-host env is detected)
- reference ``get_dist_info()``            -> :func:`get_dist_info`
- reference ``@master_only``               -> :func:`master_only`
  (rank0 == ``jax.process_index() == 0``)
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Tuple

import jax

_initialized = False


def init_dist(launcher: str = 'none', backend: str = 'ici', **kwargs) -> None:
    """Initialize multi-host JAX if requested.

    ``launcher='none'`` (single host) is a no-op — single-host multi-chip
    needs no initialization in JAX. ``launcher='jax'`` (or 'pytorch'/'slurm'
    accepted for config compatibility) calls ``jax.distributed.initialize``,
    which reads the cluster env (coordinator address, process id/count).
    """
    global _initialized
    if launcher in (None, 'none') or _initialized:
        return
    # Multi-host: coordinator discovery via env (JAX handles TPU pods and
    # Slurm natively in recent versions).
    coord = os.environ.get('COORDINATOR_ADDRESS')
    if coord is not None:
        jax.distributed.initialize(coordinator_address=coord, **kwargs)
    else:
        try:
            jax.distributed.initialize(**kwargs)
        except Exception:
            # Single-process fallback: nothing to do.
            pass
    _initialized = True


def get_dist_info() -> Tuple[int, int]:
    """Return ``(rank, world_size)`` at *process* granularity.

    Mirrors the reference contract (basicsr/utils/dist_util.py:60-71) where
    rank selects logging/saving responsibilities. Device-level parallelism is
    handled by the mesh, not by this function.
    """
    return jax.process_index(), jax.process_count()


def get_device_info() -> Tuple[int, int]:
    """Return ``(local_device_count, global_device_count)``."""
    return jax.local_device_count(), jax.device_count()


def sum_across_processes(arr):
    """Host-side sum-reduce of a numpy array over all JAX processes.

    The analog of the reference's ``dist.reduce`` of zero-initialized metric
    tensors (basicsr/models/video_base_model.py:103-111): each process fills
    a disjoint stride of rows, the sum merges them. Identity in
    single-process runs (including the 8-virtual-device CPU test mesh)."""
    import numpy as np
    if jax.process_count() == 1:
        return np.asarray(arr)
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(jax.numpy.asarray(arr))
    return np.asarray(gathered).sum(axis=0)


def is_master() -> bool:
    return jax.process_index() == 0


def master_only(func: Callable) -> Callable:
    """Decorator: run ``func`` only on process 0 (reference
    basicsr/utils/dist_util.py:74-82)."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        if is_master():
            return func(*args, **kwargs)
        return None

    return wrapper
