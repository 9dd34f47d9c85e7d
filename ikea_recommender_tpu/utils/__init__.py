from ikea_recommender_tpu.utils.logging_dicts import (
    get_logging_dict_test,
    get_logging_dict_train,
)

__all__ = ["get_logging_dict_train", "get_logging_dict_test"]
