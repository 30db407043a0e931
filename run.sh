#!/usr/bin/env bash
# Launcher (role of the reference's mpirun `run` script). No MPI: multi-host
# JAX uses the coordination service — set JAX_COORDINATOR_ADDRESS and
# JAX_PROCESS_ID per host, or nothing for single-host.
#
# Usage: ./run.sh train  [extra overrides...]
#        ./run.sh eval   [extra overrides...]
#        ./run.sh bench
set -euo pipefail
cd "$(dirname "$0")"

CONF=${CONF:-configs/step1.yaml}
CMD=${1:-train}
shift || true

case "$CMD" in
  train)
    exec python entry.py train --conf_files "$CONF" --overrides "$@" ;;
  eval|evaluate)
    exec python entry.py evaluate --conf_files "$CONF" --overrides "$@" ;;
  bench)
    exec python bench.py ;;
  *)
    echo "usage: ./run.sh {train|eval|bench} [KEY VALUE ...]" >&2; exit 2 ;;
esac
