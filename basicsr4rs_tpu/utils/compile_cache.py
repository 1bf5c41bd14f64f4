"""Persistent XLA compilation cache.

SwinIR-M's fused train step costs minutes of XLA/Mosaic compile over the
remote 'axon' tunnel (round 3's driver bench died to exactly this:
BENCH_r03.json rc=124 with the tail still building networks). JAX ships a
persistent on-disk cache keyed by (HLO, compile options, platform) that
turns every repeat compile — across processes — into a disk read; the
reference has no analog because torch eager pays no compile at all
(reference: basicsr/train.py:1 runs immediately; our compile amortizes into
the 468 ms/step train loop).

Call :func:`enable_persistent_compilation_cache` before the first jit
compilation. Opt out with BASICSR4RS_JAX_CACHE=0 (or point it at a custom
directory). Safe to call multiple times / after jax is initialized.
"""

import os

_DEFAULT_DIR = os.path.expanduser('~/.cache/basicsr4rs_tpu/xla')


def enable_persistent_compilation_cache() -> str | None:
    """Enable JAX's on-disk compilation cache; returns the dir (None if off).

    Cache entries whose compile took >=1 s are persisted (the tiny ones are
    cheaper to recompile than to hash). The cache key includes the platform,
    so CPU test runs and TPU bench runs coexist in one directory.
    """
    target = os.environ.get('BASICSR4RS_JAX_CACHE', _DEFAULT_DIR)
    if target in ('0', 'off', ''):
        return None
    import jax
    try:
        os.makedirs(target, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', target)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    except Exception:  # noqa: BLE001 — cache is an optimization, never fatal
        return None
    return target
