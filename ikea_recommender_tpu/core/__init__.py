from ikea_recommender_tpu.core.config import (
    DataConfig,
    ExperimentConfig,
    MetricsConfig,
    TrainConfig,
    load_experiment_config,
)
from ikea_recommender_tpu.core.mesh import MeshSpec, make_mesh

__all__ = [
    "DataConfig",
    "ExperimentConfig",
    "MetricsConfig",
    "TrainConfig",
    "load_experiment_config",
    "MeshSpec",
    "make_mesh",
]
