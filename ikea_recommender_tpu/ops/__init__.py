from ikea_recommender_tpu.ops.rl import (
    gather_from_3d,
    get_max_action,
    get_weighted_q_target,
    weighted_q_loss,
)
from ikea_recommender_tpu.ops.ranking import hit_ranks, hr_ndcg_at_k, topk_indices

__all__ = [
    "gather_from_3d",
    "weighted_q_loss",
    "get_weighted_q_target",
    "get_max_action",
    "topk_indices",
    "hit_ranks",
    "hr_ndcg_at_k",
]
