from ikea_recommender_tpu.analysis.embeddings import (
    cosine_similarity_matrix,
    nearest_neighbors,
)
from ikea_recommender_tpu.analysis.trajectories import (
    find_action_rows,
    sample_trajectories,
)

__all__ = [
    "cosine_similarity_matrix",
    "nearest_neighbors",
    "find_action_rows",
    "sample_trajectories",
]
