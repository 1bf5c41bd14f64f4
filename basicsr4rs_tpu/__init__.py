"""basicsr4rs_tpu — a TPU-native (JAX/XLA/Pallas/pjit) image & video
restoration framework with the capabilities of BasicSR4RS.

Layout convention: NHWC everywhere (TPU-native), params in float32 with an
optional bfloat16 compute policy, explicit `jax.random` key threading, and a
pure ``train_step(state, batch, rng) -> (state, logs)`` compiled once under
``jit`` over a device mesh.
"""

__version__ = '0.1.0'
