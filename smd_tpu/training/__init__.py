from smd_tpu.training.state import TrainState, EarlyStopping  # noqa: F401
from smd_tpu.training.optimizer import (  # noqa: F401
    stepped_exponential_schedule, make_optimizer,
)
