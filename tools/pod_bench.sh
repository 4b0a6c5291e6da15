#!/usr/bin/env bash
# One-command pod scaling benchmark (round-3 pod-readiness: the >=85%
# multi-host efficiency target of BASELINE.md is blocked on hardware only —
# when a pod slice is available, run THIS on every host, e.g.:
#
#   gcloud compute tpus tpu-vm ssh $TPU --worker=all \
#       --command="cd die_tpu && tools/pod_bench.sh --field 256 --envs 1024"
#
# It initializes the jax distributed runtime (autodetected from the standard
# TPU pod environment; override with DIE_COORD/DIE_NPROC/DIE_PID for manual
# CPU clusters), prints the process/device topology, and runs the scaling
# harness (examples/benchmark_scaling.py): batch scaling, mesh scaling with
# per-device efficiency, and SPMD overhead.
set -euo pipefail
cd "$(dirname "$0")/.."
python - "$@" <<'PY'
import os
import sys

sys.path.insert(0, ".")  # PYTHONPATH breaks the axon plugin; CLAUDE.md

import jax

if "--cpu" in sys.argv:
    # must precede ANY device query: jax is partially pre-imported at
    # interpreter startup, so the env var alone is captured too early
    jax.config.update("jax_platforms", "cpu")

from die_tpu.parallel.distributed import initialize, process_info

coord = os.environ.get("DIE_COORD")
nproc = os.environ.get("DIE_NPROC")
pid = os.environ.get("DIE_PID")
try:
    if coord:
        initialize(coord, int(nproc), int(pid))
    else:
        jax.distributed.initialize()  # autodetects on TPU pods
except Exception as e:  # single host / no pod env: run locally
    print(f"distributed init skipped ({type(e).__name__}: {e}); "
          f"running single-process", file=sys.stderr)
print("topology:", process_info(), flush=True)

sys.argv = ["benchmark_scaling"] + sys.argv[1:]
import examples.benchmark_scaling as bs

bs.main()
PY
