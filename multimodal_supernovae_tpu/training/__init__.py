from .optim import build_optimizer, freeze_mask
from .state import TrainState
