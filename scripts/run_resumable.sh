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
# optional per-attempt wall bound (0 = unbounded): a timeout-killed attempt
# resumes from the hourly orbax checkpoint, so bounding costs <=1h of progress
att_timeout="${ATTEMPT_TIMEOUT:-0}"
for i in $(seq 1 "$attempts"); do
  timeout "$att_timeout" python -m pita_tpu.train_cli "$@" && exit 0
  rc=$?
  [ "$rc" -eq 124 ] && { echo "run_resumable: attempt $i hit ATTEMPT_TIMEOUT=${att_timeout}s" >&2; exit 124; }
  echo "run_resumable: attempt $i/$attempts failed; sleeping ${nap}s" >&2
  sleep "$nap"
done
echo "run_resumable: giving up after $attempts attempts" >&2
exit 1
