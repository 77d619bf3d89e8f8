from pita_tpu.sampler.terms import SDETerms, compute_sde_terms
from pita_tpu.sampler.integrator import (
    IntegratorConfig,
    IntegrateResult,
    integrate_sde,
    negative_time_descent,
    mala,
)
