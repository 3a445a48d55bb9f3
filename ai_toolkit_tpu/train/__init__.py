from .state import TrainState
from .losses import compute_loss
from .optimizers import get_optimizer
from .step import TrainStepConfig, make_train_step

__all__ = ["TrainState", "compute_loss", "get_optimizer", "TrainStepConfig", "make_train_step"]
