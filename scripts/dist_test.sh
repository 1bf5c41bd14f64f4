#!/usr/bin/env bash
# Multi-host evaluation launcher (reference: scripts/dist_test.sh).
# See dist_train.sh for the TPU-pod launch model.
set -euo pipefail
NPROC=${1:?usage: dist_test.sh <nproc|auto> <opt.yml> [args...]}
OPT=${2:?usage: dist_test.sh <nproc|auto> <opt.yml> [args...]}
shift 2
if [ "$NPROC" != "auto" ]; then
  export JAX_PLATFORMS=cpu
  export XLA_FLAGS="--xla_force_host_platform_device_count=${NPROC} ${XLA_FLAGS:-}"
fi
exec python -m basicsr4rs_tpu.test -opt "$OPT" --launcher jax "$@"
