"""Runtime dispatch policy for the Pallas kernels.

A ``pl.pallas_call`` lowers to an opaque TPU custom call that XLA's SPMD
partitioner cannot shard: under a multi-device mesh with a batch-sharded
jitted train step, the fused kernels would force replication (all-gather of
the global batch per device) or fail sharding propagation outright. The
pure-XLA fallback paths (reference Swin/MLP branches, the one-hot DCN
sampler) partition cleanly, so models flip this flag when they build a
mesh with more than one device and every fused dispatch site consults it.

Single-device (the common per-chip case, and everything benchmarked in
docs/Performance.md) keeps the Pallas kernels. Revisit when pallas_call
grows custom-partitioning support (shard_map-wrapping the kernels is the
alternative; it changes the train-step structure, so it is a deliberate
follow-up rather than a default).
"""

from __future__ import annotations

_multi_device = False


def set_multi_device(value: bool) -> None:
    global _multi_device
    _multi_device = bool(value)


def multi_device() -> bool:
    return _multi_device


def pallas_ok() -> bool:
    """True when opaque single-device Pallas kernels are safe to emit."""
    return not _multi_device
