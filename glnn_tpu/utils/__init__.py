from glnn_tpu.utils.common import (
    CPF_data,
    OGB_data,
    NonHom_data,
    BGNN_data,
    SYNTH_prefix,
    set_seed,
    get_evaluator,
    check_writable,
    check_readable,
    get_logger,
)
from glnn_tpu.utils.config import get_training_config
from glnn_tpu.utils.splits import (
    idx_split,
    graph_split,
    sample_per_class,
    get_train_val_test_split,
)

__all__ = [
    "CPF_data", "OGB_data", "NonHom_data", "BGNN_data", "SYNTH_prefix",
    "set_seed", "get_evaluator", "check_writable", "check_readable",
    "get_logger", "get_training_config", "idx_split", "graph_split",
    "sample_per_class", "get_train_val_test_split",
]
