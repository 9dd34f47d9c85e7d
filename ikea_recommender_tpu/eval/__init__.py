from ikea_recommender_tpu.eval.protocol import (
    EvalAccum,
    EvalProtocol,
    EvalResult,
)

__all__ = ["EvalProtocol", "EvalAccum", "EvalResult"]
