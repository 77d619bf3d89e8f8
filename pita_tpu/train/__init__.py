from pita_tpu.train.buffer import ReplayBuffer, buffer_init, buffer_add, buffer_sample
from pita_tpu.train.losses import LossConfig, compute_losses
from pita_tpu.train.trainer import EnergyTempTrainer, TrainerConfig
