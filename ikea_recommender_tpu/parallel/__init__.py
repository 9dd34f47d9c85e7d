from ikea_recommender_tpu.parallel.sharding import (
    batch_sharding_tree,
    make_sharded_train_step,
    shard_state,
    state_shardings,
)
from ikea_recommender_tpu.parallel.topk import sharded_top_k, sharded_softmax_ce

__all__ = [
    "state_shardings",
    "batch_sharding_tree",
    "shard_state",
    "make_sharded_train_step",
    "sharded_top_k",
    "sharded_softmax_ce",
]
