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
    # NOTE: fused-kernel dispatch is mesh-SCOPED, not global — models open
    # ``ops.dispatch.kernel_mesh(mesh)`` inside their jitted step bodies so
    # the Pallas kernels are shard_map'ped over exactly this mesh (and
    # unrelated meshes in the same process can never alias each other).
    return Mesh(dev_array, axis_names=('data', 'spatial'))


def batch_spec(mesh: Mesh, spatial_sharded: bool = False, ndim: int = 4) -> P:
    """PartitionSpec for an image/video batch: shard N over 'data' and
    optionally the H axis over 'spatial'. H is located per rank — axis 1
    for NHWC images, axis 2 for (B,T,H,W,C) video — so spatial sharding
    never lands on the time axis (a recurrent scan over a sharded time
    axis would force XLA to gather the whole clip)."""
    if spatial_sharded and mesh.shape.get('spatial', 1) > 1 and ndim >= 4:
        parts = [None] * (ndim - 2)  # trailing (W, C) stay unsharded
        parts[0] = 'data'
        parts[ndim - 3] = 'spatial'
        return P(*parts)
    return P('data')


def shard_batch(batch: Dict[str, Any], mesh: Mesh, spatial_sharded: bool = False):
    """Device-put array leaves of a host batch with batch sharding; leave
    non-arrays (paths, strings) on host.

    Single process: leaves whose leading dim is not divisible by the
    data-axis size (e.g. val batches of 1) are replicated instead — the
    computation then runs replicated, the single-device evaluation path.

    Multi-process (``jax.distributed``): each process's loader yields its
    rank's LOCAL portion (EnlargedSampler rank striding), so shardable
    leaves are assembled into global arrays with
    ``jax.make_array_from_process_local_data`` (device_put cannot target
    non-addressable devices). Un-shardable leaves stay process-local host
    arrays: rank-disjoint validation work must NOT become a lockstep global
    computation (reference analog: each rank evaluates on its own GPU,
    video_base_model.py:46-111)."""
    replicated = NamedSharding(mesh, P())
    data_size = mesh.shape.get('data', 1)
    nproc = jax.process_count()

    def put(v):
        if isinstance(v, jax.Array):
            return v  # already on device (device prefetcher path)
        if isinstance(v, np.ndarray) and v.ndim >= 1:
            sharded = NamedSharding(mesh, batch_spec(mesh, spatial_sharded, v.ndim))
            if nproc > 1:
                local_rows = data_size // nproc
                if (data_size % nproc == 0 and local_rows > 0
                        and v.shape[0] % local_rows == 0):
                    return jax.make_array_from_process_local_data(sharded, v)
                return v  # process-local (rank-disjoint validation)
            if v.shape[0] % data_size == 0:
                return jax.device_put(v, sharded)
            return jax.device_put(v, replicated)
        return v

    return jax.tree_util.tree_map(
        put, batch, is_leaf=lambda v: isinstance(v, (np.ndarray, jax.Array, list, str)))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh (all processes must hold
    identical host values in multi-process runs — true for seeded init and
    checkpoint loads)."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda v: jax.make_array_from_process_local_data(
                sharding, np.asarray(v), np.shape(v)), tree)
    return jax.device_put(tree, sharding)


def make_batch_put_fn(mesh: Mesh, spatial_sharded: bool = False):
    """Returns the ``put_fn`` used by the DevicePrefetcher."""

    def put_fn(batch):
        return shard_batch(batch, mesh, spatial_sharded)

    return put_fn
