#!/bin/bash
# Round-5 chip queue — the order is VERDICT r4's ranking plus round-3/4
# operational lessons:
#
#   0a. Exact-parity energies asset (VERDICT r4 #3) FIRST: ~10 min of chip
#       makes every future driver bench two-sided (committed-asset gate arm).
#   0b. LJ ground-truth restore (data/*.npy is gitignored; the seeded
#       generator reproduces the committed .rhat.json diagnostics or aborts).
#   B.  LJ55 cold-rung re-anneal (VERDICT r4 #1 — THE gap to the north star)
#       behind an eval-compile prewarm; the whole stage runs under one hard
#       `timeout` so retry loops can never overrun the budget (ADVICE r4 #1).
#   A.  ALDP at half reference budget WITH on-chip evals (VERDICT r4 #2):
#       prewarm compiles the eval/transition integrate programs in a
#       sacrificial process (the >5.5-min cold eval compile of round 4 can
#       no longer eat a training window), then train with check_val=50.
#   C.  G-op validation LAST and only behind the warm-cache guard (round-4
#       cold-compile incident); rerun gate checks the PHASES are green, not
#       bare file existence (ADVICE r4 #2).
#
# Every stage is budget-gated against QUEUE_DEADLINE so the driver's
# end-of-round bench window always finds the chip free.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"

QUEUE_DEADLINE=$(( $(date +%s) + ${QUEUE_BUDGET_S:-32400} ))
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

# ---- stage 0a: exact-parity energies asset (VERDICT r4 #3) ----------------
wait_for_chip || exit 1
if [ ! -f pita_tpu/assets/bench_lj55_exact_energies.npy ]; then
  echo "[queue] stage 0a: exact-parity energies asset"
  timeout "$(cap_timeout 1200)" \
    python scripts/make_exact_energies_asset.py > /tmp/r5_asset.log 2>&1
  echo "[queue] stage 0a rc=$?"
fi

# ---- stage 0b: LJ ground-truth restore ------------------------------------
# lj13 runs on CPU in parallel with this queue (cheap); lj55 restores on the
# chip. --restore-missing skips anything already present and asserts the
# regenerated diagnostics reproduce the committed ones.
wait_for_chip || exit 1
echo "[queue] stage 0b: LJ55 ground-truth restore"
# --no-train: the re-anneal resumes from a checkpoint (buffers restored),
# so the expensive 10k-sample train set is never read
timeout "$(cap_timeout 5400)" \
  python scripts/make_ground_truth.py lj55 --restore-missing --no-train \
  > /tmp/r5_gt_lj55.log 2>&1
rc=$?
echo "[queue] stage 0b rc=$rc"
missing_gt=$(python - <<'EOF'
import os
need = [f"data/LJ55_temp_{t}_{w}.npy" for t in ("1.5", "1.2", "1.0")
        for w in ("val", "test")]
print(sum(not os.path.exists(p) for p in need))
EOF
)

# ---- stage B: LJ55 cold-rung re-anneal (VERDICT r4 #1) --------------------
wait_for_chip || exit 1
rem=$(remaining)
if [ "$missing_gt" != "0" ]; then
  echo "[queue] stage B SKIPPED: $missing_gt LJ55 ground-truth sets missing" >&2
elif [ "$rem" -ge 7200 ]; then
  echo "[queue] stage B: LJ55 eval-compile prewarm"
  # prewarm at epoch=199 (the resume point): covers the 2.0 val + all three
  # transition fills' integrate programs; mostly .jax_cache hits on this VM
  PITA_PREWARM_BUDGET_S=1500 timeout 1800 \
    python scripts/prewarm_eval_compile.py experiment=lj55 \
    energy.data_dir=data epoch=199 \
    integrator.divergence_update_interval=10 \
    > /tmp/r5_prewarm_lj55.log 2>&1
  echo "[queue] lj55 prewarm rc=$?"
  wait_for_chip || exit 1
  # reserve: ALDP needs >=3.5h after this stage when possible, but LJ55 is
  # the verdict-defining deliverable — give it the larger share.
  rem=$(remaining)
  lj55_budget=$(( rem * 55 / 100 ))
  [ "$lj55_budget" -gt 16200 ] && lj55_budget=16200
  echo "[queue] stage B: LJ55 re-anneal (hard budget ${lj55_budget}s)"
  # the hard outer timeout guarantees the stage frees the chip on schedule
  # even if the retry loop inside run_resumable keeps finding new failures
  # (ADVICE r4 #1); per-attempt timeout stays <= the stage budget
  MAX_ATTEMPTS="${LJ55_ATTEMPTS:-12}" ATTEMPT_TIMEOUT="$lj55_budget" \
    timeout $(( lj55_budget + 120 )) \
    bash scripts/run_lj55_reanneal.sh \
    > /tmp/r5_lj55.log 2>&1
  echo "[queue] stage B rc=$?"
fi

# ---- stage A: ALDP with on-chip evals (VERDICT r4 #2) ----------------------
# pre-generated MD datasets: verify they exist (ADVICE r4 #3 — a silent
# pregen failure must not push dataset MD onto the chip window)
JAX_PLATFORMS=cpu python scripts/pregen_alp_data.py aldp \
  > /tmp/r5_pregen.log 2>&1
pregen_rc=$?
aldp_data_ok=$(python - <<'EOF'
import os
need = ["data/aldp_temp_1200.00_train.npy", "data/aldp_temp_300.00_val.npy",
        "data/aldp_temp_300.00_test.npy"]
print(0 if all(os.path.exists(p) for p in need) else 1)
EOF
)
if [ "$aldp_data_ok" != "0" ]; then
  echo "[queue] stage A SKIPPED: pregen failed (rc=$pregen_rc) and datasets missing" >&2
else
  wait_for_chip || exit 1
  if [ "$(remaining)" -ge 6000 ]; then
    echo "[queue] stage A: ALDP eval-compile prewarm"
    PITA_PREWARM_BUDGET_S=2400 timeout 2700 \
      python scripts/prewarm_eval_compile.py experiment=aldp \
      energy.data_dir=data \
      "trainer.num_epochs_per_temp=(100,100,100)" \
      trainer.num_temp_annealed_samples=25000 \
      integrator.divergence_update_interval=10 \
      > /tmp/r5_prewarm_aldp.log 2>&1
    echo "[queue] aldp prewarm rc=$?"
    wait_for_chip || exit 1
    aldp_budget=$(( $(remaining) - 4200 ))
    [ "$aldp_budget" -gt 12600 ] && aldp_budget=12600
    if [ "$aldp_budget" -ge 1800 ]; then
      echo "[queue] stage A: ALDP training (hard budget ${aldp_budget}s)"
      aldp_end=$(( $(date +%s) + aldp_budget ))
      for i in $(seq 1 "${ALDP_ATTEMPTS:-6}"); do
        att=$(( aldp_end - $(date +%s) ))
        [ "$att" -lt 900 ] && break
        timeout "$att" \
          python -m pita_tpu.train_cli experiment=aldp out_dir=runs_r5 \
          ckpt_path=runs_r5/aldp_ckpt energy.data_dir=data \
          "trainer.num_epochs_per_temp=(100,100,100)" \
          trainer.num_temp_annealed_samples=25000 \
          trainer.check_val_every_n_epoch=50 \
          trainer.make_plots=true \
          time_checkpoint_seconds=1800 \
          integrator.divergence_update_interval=10 \
          >> /tmp/r5_aldp.log 2>&1 && break
        echo "[queue] aldp attempt $i failed; sleeping 240s" >&2
        sleep 240
        wait_for_chip || exit 1
      done
      echo "[queue] stage A done"
    fi
  fi
fi

# ---- stage C: G-op rerun, warm-cache-guarded ------------------------------
# rerun gate: BOTH phases green (mirrors bench.py:_g_kernel_validated), not
# bare file existence — a partial/failed validation file must not block the
# rerun forever while exact_gop stays gated off (ADVICE r4 #2)
g_op_green=$(python - <<'EOF'
import json
try:
    ph = json.load(open("docs/g_op_onchip.json"))["phases"]
    print(0 if (ph["kernel_parity"]["ok"] and ph["e2e_parity"]["ok"]) else 1)
except Exception:
    print(1)
EOF
)
wait_for_chip || exit 1
if [ "$(remaining)" -ge 2400 ] && [ "$g_op_green" != "0" ]; then
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
