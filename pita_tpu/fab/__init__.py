from pita_tpu.fab.ais import AISConfig, annealed_importance_sampling
from pita_tpu.fab.transition_operators import metropolis_transition, hmc_transition
from pita_tpu.fab.targets import ManyWell, GaussianTarget, DoubleWell1D
from pita_tpu.fab.flow import FlowDistribution, RealNVP
from pita_tpu.fab.fab_model import (
    FABConfig,
    fab_loss,
    train_fab,
    train_fab_with_prioritised_buffer,
)
