#!/bin/bash
# Crash-safe training runner (SURVEY §5.3 resumable-run parity, hardened for
# tunneled TPU runtimes): a worker restart kills the in-process PJRT client
# irrecoverably, so in-process retries cannot heal it — a fresh process plus
# orbax resume (ckpt_path=... on the CLI) continues the run where it stopped.
#
# Usage: scripts/run_resumable.sh experiment=lj55 ckpt_path=runs/lj55_ckpt ...
set -u
attempts="${MAX_ATTEMPTS:-12}"
nap="${RETRY_SLEEP:-240}"  # tunneled workers take minutes to come back
for i in $(seq 1 "$attempts"); do
  python -m pita_tpu.train_cli "$@" && exit 0
  echo "run_resumable: attempt $i/$attempts failed; sleeping ${nap}s" >&2
  sleep "$nap"
done
echo "run_resumable: giving up after $attempts attempts" >&2
exit 1
