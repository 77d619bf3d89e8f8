from pita_tpu.baselines.mcmc import mala_chain, hmc_chain, generate_lj_dataset
