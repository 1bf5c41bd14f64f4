"""Device-mesh construction and sharding helpers.

This replaces the reference's entire NCCL/DDP layer (basicsr/utils/dist_util.py,
base_model.py:95-103): parallelism is declared as shardings over a
``jax.sharding.Mesh`` and XLA compiles the collectives onto ICI/DCN.

Axes:
  * ``data``    — batch sharding (the reference's DDP data parallelism).
  * ``spatial`` — optional sharding of the image H axis across devices for
    huge RS tiles (context-parallel analog; convs get halo exchanges from
    XLA's spmd partitioner automatically).

Config (``opt['parallel']``)::

    parallel:
      data: -1        # -1 = all remaining devices
      spatial: 1
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(opt: Optional[Dict[str, Any]] = None,
                devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, spatial) mesh from ``opt['parallel']`` (or all devices
    on the data axis by default)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    par = (opt or {}).get('parallel') or {}
    spatial = int(par.get('spatial', 1))
    data = int(par.get('data', -1))
    if data == -1:
        data = n // spatial
    if data * spatial != n:
        raise ValueError(f'parallel axes data={data} x spatial={spatial} != device count {n}')
    dev_array = np.asarray(devices).reshape(data, spatial)
    # opaque single-device Pallas kernels cannot be SPMD-partitioned; flip
    # every fused-kernel dispatch site to its XLA fallback on multi-device
    # meshes (ops/dispatch.py)
    from ..ops import dispatch
    dispatch.set_multi_device(n > 1)
    return Mesh(dev_array, axis_names=('data', 'spatial'))


def batch_spec(mesh: Mesh, spatial_sharded: bool = False) -> P:
    """PartitionSpec for an NHWC batch: shard N over 'data' (and optionally
    H over 'spatial')."""
    if spatial_sharded and mesh.shape.get('spatial', 1) > 1:
        return P('data', 'spatial')
    return P('data')


def shard_batch(batch: Dict[str, Any], mesh: Mesh, spatial_sharded: bool = False):
    """Device-put array leaves of a host batch with batch sharding; leave
    non-arrays (paths, strings) on host. Leaves whose leading dim is not
    divisible by the data-axis size (e.g. val batches of 1) are replicated
    instead — the computation then runs replicated, which is the single-
    device evaluation path."""
    spec = batch_spec(mesh, spatial_sharded)
    sharded = NamedSharding(mesh, spec)
    replicated = NamedSharding(mesh, P())
    data_size = mesh.shape.get('data', 1)

    def put(v):
        if isinstance(v, jax.Array):
            return v  # already on device (device prefetcher path)
        if isinstance(v, np.ndarray) and v.ndim >= 1:
            if v.shape[0] % data_size == 0:
                return jax.device_put(v, sharded)
            return jax.device_put(v, replicated)
        return v

    return jax.tree_util.tree_map(
        put, batch, is_leaf=lambda v: isinstance(v, (np.ndarray, jax.Array, list, str)))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def make_batch_put_fn(mesh: Mesh, spatial_sharded: bool = False):
    """Returns the ``put_fn`` used by the DevicePrefetcher."""

    def put_fn(batch):
        return shard_batch(batch, mesh, spatial_sharded)

    return put_fn
