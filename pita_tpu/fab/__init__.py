from pita_tpu.fab.ais import AISConfig, annealed_importance_sampling
from pita_tpu.fab.transition_operators import metropolis_transition, hmc_transition
from pita_tpu.fab.targets import ManyWell, GaussianTarget, DoubleWell1D
