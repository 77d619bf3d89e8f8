from pita_tpu.ops.pallas.lj import lj_log_prob_and_force
