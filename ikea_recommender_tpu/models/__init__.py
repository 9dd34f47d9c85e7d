from ikea_recommender_tpu.models.backbone import BackboneConfig, init_backbone, apply_backbone
from ikea_recommender_tpu.models.families import (
    ModelConfig,
    apply_model,
    init_model,
    model_config_from_train,
)

__all__ = [
    "BackboneConfig",
    "init_backbone",
    "apply_backbone",
    "ModelConfig",
    "init_model",
    "apply_model",
    "model_config_from_train",
]
