from ikea_recommender_tpu.data.tokenizer import Tokenizer
from ikea_recommender_tpu.data.replay_buffer import (
    EvalBuffer,
    ReplayBuffer,
    eval_batches,
    train_batches,
)
from ikea_recommender_tpu.data.preprocessing import (
    preprocess_train_data,
    preprocess_val_data,
    window_sessions,
)

__all__ = [
    "Tokenizer",
    "ReplayBuffer",
    "EvalBuffer",
    "train_batches",
    "eval_batches",
    "window_sessions",
    "preprocess_train_data",
    "preprocess_val_data",
]
