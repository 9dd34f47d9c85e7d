from ikea_recommender_tpu.train.state import (
    DoubleQState,
    TrainState,
    make_double_q_state,
    make_train_state,
)
from ikea_recommender_tpu.train.steps import (
    RLStepConfig,
    make_train_step,
)

__all__ = [
    "TrainState",
    "DoubleQState",
    "make_train_state",
    "make_double_q_state",
    "RLStepConfig",
    "make_train_step",
]
