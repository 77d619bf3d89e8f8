from pita_tpu.schedules.noise import (
    NoiseSchedule,
    LinearNoiseSchedule,
    QuadraticNoiseSchedule,
    PowerNoiseSchedule,
    SubLinearNoiseSchedule,
    GeometricNoiseSchedule,
    ElucidatingNoiseSchedule,
)
from pita_tpu.schedules.annealing import (
    AnnealingSchedule,
    ConstantAnnealingSchedule,
    LinearAnnealingSchedule,
    SigmoidAnnealingSchedule,
)
