from pita_tpu.nets.mlp import MLPBackbone
from pita_tpu.nets.egnn import EGNNBackbone
from pita_tpu.nets.dit import DiT3DBackbone
from pita_tpu.nets.torchmd_et import TorchMDETBackbone
from pita_tpu.nets.precondition import ScoreWrapper, EnergyWrapper
from pita_tpu.nets.ema import EMAState, ema_init, ema_update
