from mural_tpu.train.optim import build_optimizer, LRSchedule
from mural_tpu.train.state import TrainState, create_train_state
from mural_tpu.train.steps import make_train_step, make_eval_step
from mural_tpu.train.checkpoint import save_checkpoint, load_checkpoint
from mural_tpu.train.early_stopping import EarlyStopping

__all__ = [
    "build_optimizer", "LRSchedule", "TrainState", "create_train_state",
    "make_train_step", "make_eval_step", "save_checkpoint",
    "load_checkpoint", "EarlyStopping",
]
