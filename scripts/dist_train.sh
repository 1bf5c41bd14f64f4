#!/usr/bin/env bash
# Multi-host training launcher (reference: scripts/dist_train.sh).
#
# On TPU pods, JAX discovers the mesh from the TPU runtime: run this SAME
# command on every host (e.g. via `gcloud compute tpus tpu-vm ssh --worker=all`)
# and jax.distributed.initialize() wires the hosts together. There is no
# torchrun-style process-per-GPU spawn — one process per host drives all
# local chips.
#
# Usage: ./scripts/dist_train.sh <nproc-or-auto> <train_opt.yml> [extra args]

set -euo pipefail
NPROC=${1:?usage: dist_train.sh <nproc|auto> <opt.yml> [args...]}
OPT=${2:?usage: dist_train.sh <nproc|auto> <opt.yml> [args...]}
shift 2

if [ "$NPROC" != "auto" ]; then
  # CPU simulation of an N-device mesh (useful for testing shardings)
  export JAX_PLATFORMS=cpu
  export XLA_FLAGS="--xla_force_host_platform_device_count=${NPROC} ${XLA_FLAGS:-}"
fi

exec python -m basicsr4rs_tpu.train -opt "$OPT" --launcher jax "$@"
