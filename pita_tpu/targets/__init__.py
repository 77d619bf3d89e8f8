from pita_tpu.targets.base import Target
from pita_tpu.targets.priors import Prior, MeanFreePrior, IsotropicGaussianPrior
from pita_tpu.targets.gmm import GMM40, gmm_power
from pita_tpu.targets.lj import LennardJones, LJ13, LJ55
from pita_tpu.targets.dw4 import DoubleWell4
