from ikea_recommender_tpu.run.checkpoints import BestModelTracker, CheckpointManager
from ikea_recommender_tpu.run.trainer import TrainOutcome, train

__all__ = ["BestModelTracker", "CheckpointManager", "train", "TrainOutcome"]
