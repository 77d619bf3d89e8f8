#!/bin/bash
# Round-5 chip queue — ordering learned from rounds 3/4:
#
#   A. ALDP training (VERDICT r3 next #3) FIRST: it is the cheapest
#      still-missing on-chip deliverable (22 atoms, DiT3D; the round-4
#      session that queued it last never reached it twice in a row).
#      MD datasets must be pre-generated on CPU (scripts/pregen_alp_data.py)
#      so the chip window is spent training, not on dataset MD.
#   B. LJ55 cold-rung re-anneal (VERDICT r3 next #2) with the floor-gated
#      transition fills — the long job, gets the bulk of the budget.
#   C. G-op validation rerun (resampling-off wiring check + 2048 rung) —
#      LAST and only behind a warm-cache guard: the round-4b rerun from a
#      cold local compilation cache stalled >14 min in the Mosaic compile
#      and wedged the tunneled worker for 10+ min (PERF.md cold-compile
#      incident). The guard AOT-lowers/compiles the kernel in a sacrificial
#      process first; only if that exits 0 does the validation run.
#
# Every stage is budget-gated against QUEUE_DEADLINE so the driver's
# end-of-round bench window always finds the chip free.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"

QUEUE_DEADLINE=$(( $(date +%s) + ${QUEUE_BUDGET_S:-34800} ))
remaining() { echo $(( QUEUE_DEADLINE - $(date +%s) )); }

wait_for_chip() {
  for i in $(seq 1 "${PROBE_ATTEMPTS:-48}"); do
    if [ "$(remaining)" -lt 900 ]; then
      echo "[queue] budget exhausted while waiting for chip" >&2; return 1
    fi
    timeout 120 python -c \
      "import jax, jax.numpy as jnp; print(float(jnp.ones((8,8)).sum()))" \
      >> /tmp/r5_probe.log 2>&1 && return 0
    echo "[queue] chip probe $i failed; sleeping 240s" >&2
    sleep 240
  done
  return 1
}

cap_timeout() {
  local cap=$1 rem
  rem=$(( $(remaining) - 600 ))
  [ "$rem" -lt "$cap" ] && cap=$rem
  echo "$cap"
}

# ---- stage A: ALDP --------------------------------------------------------
JAX_PLATFORMS=cpu python scripts/pregen_alp_data.py aldp \
  > /tmp/r5_pregen.log 2>&1
wait_for_chip || exit 1
echo "[queue] stage A: ALDP training"
for i in $(seq 1 "${ALDP_ATTEMPTS:-8}"); do
  [ "$(remaining)" -lt 1800 ] && break
  timeout "$(cap_timeout 10800)" \
    python -m pita_tpu.train_cli experiment=aldp out_dir=runs_r5 \
    ckpt_path=runs_r5/aldp_ckpt energy.data_dir=data \
    "trainer.num_epochs_per_temp=(100,100,100)" \
    trainer.num_temp_annealed_samples=25000 \
    trainer.make_plots=true \
    time_checkpoint_seconds=1800 \
    integrator.divergence_update_interval=10 \
    >> /tmp/r5_aldp.log 2>&1 && break
  echo "[queue] aldp attempt $i failed; sleeping 240s" >&2
  sleep 240
  wait_for_chip || exit 1
done
echo "[queue] stage A done"

# ---- stage B: LJ55 re-anneal ---------------------------------------------
wait_for_chip || exit 1
rem=$(remaining)
if [ "$rem" -ge 7200 ]; then
  echo "[queue] stage B: LJ55 cold-rung re-anneal"
  lj55_budget=$(( rem - 3600 ))
  MAX_ATTEMPTS="${LJ55_ATTEMPTS:-12}" ATTEMPT_TIMEOUT="$lj55_budget" \
    bash scripts/run_lj55_reanneal.sh > /tmp/r5_lj55.log 2>&1
  echo "[queue] stage B rc=$?"
fi

# ---- stage C: G-op rerun, warm-cache-guarded ------------------------------
wait_for_chip || exit 1
if [ "$(remaining)" -ge 2400 ] && [ ! -f docs/g_op_onchip.json ]; then
  echo "[queue] stage C: G-op warm-cache guard"
  PITA_TPU_ENABLE_EXPERIMENTAL_PALLAS=1 timeout 1200 \
    python -c "
from pita_tpu.ops.pallas.g_op import g_operator_contract
import jax, jax.numpy as jnp
N, F, T, B = 55, 32, 165, 8
z = lambda *s: jnp.zeros(s, jnp.float32)
out = g_operator_contract(z(B,N,N,F), z(B,N,N,F), z(B,N,N), z(B,N,N,F),
                          z(B,N,N,F), z(F,F), z(T,B,N,F), rows_per_block=8)
jax.block_until_ready(out); print('warm ok')
" >> /tmp/r5_g_op.log 2>&1
  if [ $? -eq 0 ] && [ "$(remaining)" -ge 1800 ]; then
    echo "[queue] stage C: G-op validation (cache warm)"
    PITA_TPU_ENABLE_EXPERIMENTAL_PALLAS=1 timeout "$(cap_timeout 1500)" \
      python scripts/validate_g_op_onchip.py >> /tmp/r5_g_op.log 2>&1
    echo "[queue] stage C rc=$?"
  else
    echo "[queue] stage C: warm guard failed or no budget; skipping"
  fi
fi
echo "[queue] done"
