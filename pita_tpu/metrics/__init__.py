from pita_tpu.metrics.distances import (
    emd2_1d,
    wasserstein_1d,
    energy_distances,
    compute_distribution_distances,
    wasserstein2_exact,
    sinkhorn_divergence,
    torus_wasserstein,
)
from pita_tpu.metrics.mmd import mix_rbf_mmd2, linear_mmd2, poly_mmd2
from pita_tpu.metrics.ess import effective_sample_size, log_effective_sample_size
