#!/bin/bash
# Round-3 serialized chip queue (one shared tunneled TPU — never run two
# device jobs at once, NOTES.md):
#   0. wait for the tunneled worker to answer a device probe (a dead worker
#      hangs the PJRT client forever; probing keeps the hang bounded)
#   1. LJ13 test phase, cold ladder pairs (completes VERDICT r2 item 3 —
#      the warm pairs were scored offline from saved round-2 dumps)
#   2. ALDP at half the reference budget (VERDICT r2 item 4): 100 epochs
#      per rung x 3 rungs, 25k transition chains, K=10 divergence
#      quadrature (the LJ55 round-3 ladder's validated mode), ESS-triggered
#      transition fills (preset default), Ramachandran/torus-W/TICA evals.
# Each stage is crash-safe: attempts are timeout-bounded, a dead process
# relaunches, and orbax (hourly wall-clock interval) + CSV state resume.
# Logs: /tmp/r3_probe.log, /tmp/r3_lj13_test.log, /tmp/r3_aldp.log.
set -u
cd "$(dirname "$0")/.."

wait_for_chip() {
  for i in $(seq 1 "${PROBE_ATTEMPTS:-48}"); do
    timeout 300 python -c "import jax; print(jax.devices())" \
      >> /tmp/r3_probe.log 2>&1 && return 0
    echo "[queue] chip probe $i failed; sleeping 240s" >&2
    sleep 240
  done
  echo "[queue] chip never came up" >&2
  return 1
}

wait_for_chip || exit 1

echo "[queue] stage 1: LJ13 cold-pair test phase"
for i in $(seq 1 "${LJ13_ATTEMPTS:-6}"); do
  timeout 7200 python -m pita_tpu.eval_cli experiment=lj13 \
    ckpt_path=runs_r3/lj13_ckpt out_dir=runs_r3/lj13_test \
    "trainer.temps_to_anneal_test=((1.5,1.2),(1.2,1.0))" \
    trainer.make_plots=true \
    >> /tmp/r3_lj13_test.log 2>&1 && break
  echo "[queue] lj13 test attempt $i failed; sleeping 240s" >&2
  sleep 240
  wait_for_chip || exit 1
done

echo "[queue] stage 2: ALDP half-budget training"
for i in $(seq 1 "${ALDP_ATTEMPTS:-40}"); do
  timeout 14400 python -m pita_tpu.train_cli experiment=aldp out_dir=runs_r3 \
    ckpt_path=runs_r3/aldp_ckpt energy.data_dir=data \
    "trainer.num_epochs_per_temp=(100,100,100)" \
    trainer.num_temp_annealed_samples=25000 \
    trainer.make_plots=true \
    time_checkpoint_seconds=3600 \
    integrator.divergence_update_interval=10 \
    >> /tmp/r3_aldp.log 2>&1 && break
  echo "[queue] aldp attempt $i failed; sleeping 240s" >&2
  sleep 240
  wait_for_chip || exit 1
done
echo "[queue] done"
