"""Test configuration: force JAX onto CPU with 8 virtual devices so
multi-device sharding paths are exercised without TPU hardware
(SURVEY.md §4 implication; the reference has no distributed tests at all).

Note: the environment's sitecustomize registers the remote 'axon' TPU
backend and overrides JAX_PLATFORMS, so env vars alone don't stick — we must
update jax.config before any backend is initialized.
"""

import os

_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (_flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
