"""Mesh-scoped dispatch for the Pallas fused kernels.

A ``pl.pallas_call`` lowers to an opaque TPU custom call that XLA's SPMD
partitioner cannot shard. Round 2 handled this with a process-global
"multi-device" flag that routed every fused dispatch site to its XLA
fallback — which meant scaling past one chip silently lost every kernel
(the attention stack alone is 4.36x slower un-fused), and the latest-wins
global aliased unrelated meshes in one process (ADVICE r2, medium).

Round 3 replaces both halves:

* **Scope, not a global.** The mesh in effect at a dispatch site is
  whatever ``kernel_mesh(mesh)`` context is active *at trace time*. Models
  open the context inside the function they hand to ``jax.jit`` (the body
  runs exactly once per trace), so two models with different meshes in one
  process can never alias each other, and code traced outside any scope
  keeps plain single-device semantics.

* **shard_map, not fallback.** Under a multi-device scope the fused ops
  wrap their Pallas calls in ``jax.shard_map`` over the mesh: batch
  operands arrive as per-device local shards, weights arrive replicated
  (in_spec ``P()``), and shard_map's transpose inserts the weight-gradient
  ``psum`` over the mesh axes — the DDP all-reduce analog, verified
  bit-exact against single-device execution in
  tests/test_ops/test_sharded_kernels.py. Only when a shape cannot be
  sharded evenly (validation batches of 1, odd geometries) does a site
  fall back to its partitionable XLA reference path.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional, Tuple

import jax
from jax.sharding import Mesh

_scope = threading.local()


def _stack():
    if not hasattr(_scope, 'stack'):
        _scope.stack = []
    return _scope.stack


@contextlib.contextmanager
def kernel_mesh(mesh: Optional[Mesh]):
    """Scope ``mesh`` for fused-kernel dispatch. Open this INSIDE the
    function being jitted (trace-time scoping): the ops traced under it
    shard_map their Pallas kernels over the mesh's axes."""
    _stack().append(mesh)
    try:
        yield
    finally:
        _stack().pop()


def active_mesh() -> Optional[Mesh]:
    stack = _stack()
    return stack[-1] if stack else None


def mesh_info() -> Tuple[Optional[Mesh], int, int]:
    """(mesh, data_size, spatial_size) of the innermost scope; a size-1
    mesh (the single-chip case) reports (None, 1, 1) — plain dispatch."""
    mesh = active_mesh()
    if mesh is None:
        return None, 1, 1
    data = int(mesh.shape.get('data', 1))
    spatial = int(mesh.shape.get('spatial', 1))
    if data * spatial <= 1:
        return None, 1, 1
    return mesh, data, spatial


def pallas_ok() -> bool:
    """True when an opaque single-device Pallas kernel is safe to emit
    directly (no multi-device mesh in scope)."""
    return mesh_info()[0] is None


@contextlib.contextmanager
def force_interpret():
    """Test hook: route every fused dispatch site onto its Pallas kernel in
    interpret mode, regardless of backend. Lets CPU tests (and the driver's
    virtual-device dryrun) execute whole models THROUGH the kernels +
    shard_map machinery instead of the XLA fallbacks."""
    prev = getattr(_scope, 'force_interpret', False)
    _scope.force_interpret = True
    try:
        yield
    finally:
        _scope.force_interpret = prev


def interpret_forced() -> bool:
    return getattr(_scope, 'force_interpret', False)


def window_shard_specs(data: int, spatial: int, b: int, h: int, w: int,
                       window_size: int, nwb: int):
    """The sharding contract shared by every fused window op (attention
    branch, joint block, raw window attention): batch shards over 'data';
    H shards over 'spatial' iff every shard keeps whole window rows; a
    per-window bias (shift masks, nwb = nwh*nww row-major) shards its
    window axis over 'spatial' so shard-local window-row indices hit the
    right mask rows. Weight/bias cotangents are psum'd over unmapped axes
    by the shard_map transpose.

    Returns ``(xspec, bias_spec)``, or ``None`` when the geometry cannot
    shard evenly (the call site falls back to its partitionable XLA path).
    """
    from jax.sharding import PartitionSpec as P
    ok = (b % data == 0 and h % (spatial * window_size) == 0
          and (nwb == 1 or nwb == (h // window_size) * (w // window_size)))
    if not ok:
        return None
    xspec = P('data', 'spatial') if spatial > 1 else P('data')
    bias_spec = P('spatial') if (spatial > 1 and nwb > 1) else P()
    return xspec, bias_spec


def shard_wrap(fn, mesh: Mesh, in_specs, out_specs):
    """shard_map a kernel-calling fn over ``mesh``. ``check_vma=False``:
    the body is an opaque custom call Pallas can't derive varying-manual
    axes for; transposes still psum the cotangents of P()-replicated
    inputs (pinned by tests/test_ops/test_sharded_kernels.py)."""
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
