from pita_tpu.ops.resampling import systematic_resample, count_unique
from pita_tpu.ops.divergence import (
    exact_divergence,
    exact_laplacian,
    hutchinson_divergence,
)
