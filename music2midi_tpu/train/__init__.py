from .adafactor import adafactor_hf  # noqa: F401
from .loop import (  # noqa: F401
    TrainState,
    make_eval_step,
    make_multi_step,
    make_train_step,
)
