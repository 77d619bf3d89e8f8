#!/bin/bash
# Round-5 final-window LJ55 plan, revision B (see NOTES.md round-5):
# the measure-then-retry fill (attempt 0 at reference parity, retry 1
# escalated) does not fit the remaining window — attempt 0 alone measured
# 19 min last night and the raw fill ESS is already known (0.0027, deep in
# the collapse band where the escalation wins, docs/transition_fill_study
# .json). So the escalated semantics (ESS-triggered adaptive-SMC resampling
# + 30 extra MALA steps — exactly what retry 1 would have used) are applied
# AT attempt 0 via trainer.transition_ess_threshold/transition_post_mcmc_
# steps, with retries capped at 0: one fill, ~20 min, measured and recorded
# by the (still-active) quality floor. The transition is moved to epoch 175
# (the surviving time-checkpoint is epoch 174; re-training 25 epochs of the
# already-full-budget 2.0 rung would cost the window more than the rung
# gains). Stage 3 tests the (2.0,1.5) pair at 2048 saved samples from the
# checkpoint no matter how far stage 2 got.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
DEADLINE=${DEADLINE:-$(( $(date +%s) + 2280 ))}   # stage-2 cut
remaining() { echo $(( DEADLINE - $(date +%s) )); }

echo "[scoped-b] stage 2 cut in $(remaining)s ($(date -u +%H:%M:%S))"
timeout "$(remaining)" python -m pita_tpu.train_cli experiment=lj55 out_dir=runs_r5 \
  ckpt_path=runs_r5/lj55_ckpt energy.data_dir=data test=false \
  "trainer.num_epochs_per_temp=(175,165,0)" trainer.max_epochs=340 \
  trainer.check_val_every_n_epoch=1000 \
  trainer.transition_fill_max_retries=0 \
  trainer.transition_ess_threshold=0.3 \
  trainer.transition_post_mcmc_steps=30 \
  trainer.num_samples_to_save=2048 trainer.test_batch_size=2048 \
  "trainer.temps_to_anneal_test=((2.0,1.5),)" trainer.make_plots=true \
  time_checkpoint_seconds=300 integrator.divergence_update_interval=10 \
  >> /tmp/lj55_train_b.log 2>&1
echo "[scoped-b] stage 2 rc=$? ($(date -u +%H:%M:%S))"

timeout 120 python -c \
  "import jax, jax.numpy as jnp; print(float(jnp.ones((8,8)).sum()))" \
  >> /tmp/lj55_probe.log 2>&1 || exit 1
echo "[scoped-b] stage 3: test ($(date -u +%H:%M:%S))"
timeout 700 python - > /tmp/lj55_test.log 2>&1 <<'EOF'
import json, os
from pita_tpu.utils.platform import honor_platform_env
honor_platform_env()
from pita_tpu.configs import compose, parse_overrides, build_trainer
from pita_tpu.io.checkpoint import restore_checkpoint
ov = parse_overrides([
    "trainer.num_epochs_per_temp=(175,165,0)", "trainer.max_epochs=340",
    "trainer.num_samples_to_save=2048", "trainer.test_batch_size=2048",
    "trainer.temps_to_anneal_test=((2.0,1.5),)", "trainer.make_plots=true",
    "integrator.divergence_update_interval=10", "energy.data_dir=data",
    "out_dir=runs_r5",
])
cfg = compose("lj55", overrides=ov)
trainer = build_trainer(cfg, resume=True)
restore_checkpoint(trainer, "runs_r5/lj55_ckpt")
print("testing from epoch", trainer.epoch)
m = trainer.test()
with open(os.path.join(trainer.out_dir, "test_metrics.json"), "w") as f:
    json.dump({"epoch": trainer.epoch, "metrics": m}, f, indent=1)
print(json.dumps(m, indent=1))
EOF
echo "[scoped-b] stage 3 rc=$? ($(date -u +%H:%M:%S))"
