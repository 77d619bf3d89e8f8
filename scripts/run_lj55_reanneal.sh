#!/bin/bash
# Round-4 first chip job: redo the LJ55 ladder's cold rungs with the
# ESS-collapse mitigation (NOTES.md round-3 post-mortem).
#
# Round 3 trained the full ladder at reference budget, but every rung
# transition filled the next buffer at collapsed per-island ESS
# (0.005-0.018 at 1024-chain islands) — the cold rungs trained on ~5-18
# effective samples and their test-phase energies sit 5-8.7 sigma hot.
# The lj55 preset now fills transitions with ESS-triggered adaptive-SMC
# resampling + 20 MALA re-diversification steps (bench-gate-validated
# semantics), so resuming from the trained-at-2.0 rung-0 checkpoint and
# re-descending the ladder exercises the fix end-to-end.
#
# Uses the round-2 rung-0 checkpoint (epoch 199, T=2.0 trained at full
# budget) — the cold rungs and their buffers are re-created from scratch.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs_r5
[ -d runs_r5/lj55_ckpt ] || cp -r runs_r2/lj55_ckpt runs_r5/lj55_ckpt
MAX_ATTEMPTS="${MAX_ATTEMPTS:-40}" RETRY_SLEEP=240 \
  bash scripts/run_resumable.sh experiment=lj55 out_dir=runs_r5 \
  ckpt_path=runs_r5/lj55_ckpt energy.data_dir=data \
  time_checkpoint_seconds=3600 \
  integrator.divergence_update_interval=10 \
  trainer.make_plots=true \
  "$@"
