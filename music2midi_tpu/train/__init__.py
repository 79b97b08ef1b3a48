from .adafactor import adafactor_hf  # noqa: F401
from .loop import TrainState, make_train_step, make_eval_step  # noqa: F401
