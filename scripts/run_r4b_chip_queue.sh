#!/bin/bash
# Round-4 queue, second launch (the first died with a session restart after
# completing stages A-C). Remaining stages, in order:
#   D. LJ13 test phase, cold ladder pairs (VERDICT r3 next #4).
#   C'. G-op kernel on-chip validation retry — runs only if the Mosaic
#       reshape fix has landed (marker file /tmp/r4_g_op_ready, touched by
#       the builder once the kernel AOT-compiles). Checked both before and
#       after stage E so a late fix still gets its chip window.
#   E. LJ55 cold-rung re-anneal with floor-gated transition fills
#      (VERDICT r3 next #2) — resumable, bounded attempts.
#   F. ALDP training at half reference budget (VERDICT r3 next #3).
# Logs: /tmp/r4_*.log
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"

QUEUE_DEADLINE=$(( $(date +%s) + ${QUEUE_BUDGET_S:-34800} ))
remaining() { echo $(( QUEUE_DEADLINE - $(date +%s) )); }

wait_for_chip() {
  for i in $(seq 1 "${PROBE_ATTEMPTS:-48}"); do
    if [ "$(remaining)" -lt 900 ]; then
      echo "[queue] budget exhausted while waiting for chip; stopping" >&2
      return 1
    fi
    timeout 300 python -c "import jax; print(jax.devices())" \
      >> /tmp/r4_probe.log 2>&1 && return 0
    echo "[queue] chip probe $i failed; sleeping 240s" >&2
    sleep 240
  done
  echo "[queue] chip never came up" >&2
  return 1
}

cap_timeout() {
  local cap=$1 rem
  rem=$(( $(remaining) - 600 ))
  [ "$rem" -lt "$cap" ] && cap=$rem
  echo "$cap"
}

g_op_retry() {
  # Marker-gated: only consumes a chip window once the Mosaic fix exists.
  if [ -f /tmp/r4_g_op_ready ] && [ ! -f docs/g_op_onchip.json ] \
      && [ "$(remaining)" -ge 1500 ]; then
    echo "[queue] stage C': G-op on-chip validation (fix landed)"
    PITA_TPU_ENABLE_EXPERIMENTAL_PALLAS=1 timeout "$(cap_timeout 2400)" \
      python scripts/validate_g_op_onchip.py >> /tmp/r4_g_op.log 2>&1
    echo "[queue] stage C' rc=$? ($(tail -c 300 docs/g_op_onchip.json 2>/dev/null))"
  fi
}

wait_for_chip || exit 1

echo "[queue] stage D: LJ13 cold-pair test phase"
for i in $(seq 1 "${LJ13_ATTEMPTS:-4}"); do
  [ "$(remaining)" -lt 1800 ] && { echo "[queue] no budget for lj13 test"; break; }
  timeout "$(cap_timeout 7200)" python -m pita_tpu.eval_cli experiment=lj13 \
    ckpt_path=runs_r3/lj13_ckpt out_dir=runs_r4/lj13_test \
    "trainer.temps_to_anneal_test=((1.5,1.2),(1.2,1.0))" \
    trainer.make_plots=true \
    >> /tmp/r4_lj13_test.log 2>&1 && break
  echo "[queue] lj13 test attempt $i failed; sleeping 240s" >&2
  sleep 240
  wait_for_chip || exit 1
done
echo "[queue] stage D done"

g_op_retry
wait_for_chip || exit 1

echo "[queue] stage E: LJ55 cold-rung re-anneal (floor-gated fills)"
rem=$(remaining)
if [ "$rem" -lt 3600 ]; then
  echo "[queue] <1h of budget left; skipping training stages"; exit 0
fi
lj55_budget=$(( rem - 9000 )); [ "$lj55_budget" -lt 10800 ] && lj55_budget=10800
[ "$lj55_budget" -gt $(( rem - 600 )) ] && lj55_budget=$(( rem - 600 ))
MAX_ATTEMPTS="${LJ55_ATTEMPTS:-12}" ATTEMPT_TIMEOUT="$lj55_budget" \
  bash scripts/run_lj55_reanneal.sh \
  > /tmp/r4_lj55_reanneal.log 2>&1
echo "[queue] stage E rc=$?"

g_op_retry
wait_for_chip || exit 1

echo "[queue] stage F: ALDP half-budget training"
mkdir -p runs_r4
aldp_budget=$(( $(remaining) - 600 ))
if [ "$aldp_budget" -lt 1800 ]; then
  echo "[queue] no budget left for ALDP; done"; exit 0
fi
for i in $(seq 1 "${ALDP_ATTEMPTS:-20}"); do
  [ "$(remaining)" -lt 1800 ] && { echo "[queue] ALDP budget exhausted"; break; }
  timeout $(( $(remaining) - 600 )) \
    python -m pita_tpu.train_cli experiment=aldp out_dir=runs_r4 \
    ckpt_path=runs_r4/aldp_ckpt energy.data_dir=data \
    "trainer.num_epochs_per_temp=(100,100,100)" \
    trainer.num_temp_annealed_samples=25000 \
    trainer.make_plots=true \
    time_checkpoint_seconds=3600 \
    integrator.divergence_update_interval=10 \
    >> /tmp/r4_aldp.log 2>&1 && break
  echo "[queue] aldp attempt $i failed; sleeping 240s" >&2
  sleep 240
  wait_for_chip || exit 1
done
echo "[queue] done"
