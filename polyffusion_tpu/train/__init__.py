"""Training runtime: optimizer/state, jitted steps, schedulers, and the loop."""

from .loop import Trainer  # noqa: F401
from .schedulers import (  # noqa: F401
    ConstantScheduler,
    ParameterScheduler,
    TeacherForcingScheduler,
)
from .state import TrainState, create_state, make_optimizer, param_count  # noqa: F401
from .step import make_eval_step, make_train_step  # noqa: F401
