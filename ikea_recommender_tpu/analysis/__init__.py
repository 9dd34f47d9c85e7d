from ikea_recommender_tpu.analysis.embeddings import (
    cosine_similarity_matrix,
    nearest_neighbors,
)
from ikea_recommender_tpu.analysis.trajectories import (
    find_action_rows,
    predict_and_describe,
    sample_trajectories,
)
from ikea_recommender_tpu.analysis.visualize import (
    find_hits,
    plot_stream_and_predictions,
    render_predictions_html,
)

__all__ = [
    "cosine_similarity_matrix",
    "nearest_neighbors",
    "find_action_rows",
    "predict_and_describe",
    "sample_trajectories",
    "find_hits",
    "plot_stream_and_predictions",
    "render_predictions_html",
]
