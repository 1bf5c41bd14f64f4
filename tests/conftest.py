"""Test configuration: force JAX onto CPU with 8 virtual devices so
multi-device sharding paths are exercised without TPU hardware
(SURVEY.md §4 implication; the reference has no distributed tests at all)."""

import os

# Must be set before jax is imported anywhere.
os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (_flags + ' --xla_force_host_platform_device_count=8').strip()
