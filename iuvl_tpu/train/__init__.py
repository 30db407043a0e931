from .optimizer import build_optimizer, build_lr_schedule  # noqa: F401
from .train_step import TrainState, make_train_step, split_seg_outputs  # noqa: F401
