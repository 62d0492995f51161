from glnn_tpu.train.engine import (
    run_transductive,
    run_inductive,
    distill_run_transductive,
    distill_run_inductive,
    make_gnn_train_step,
    make_eval_fn,
    make_mlp_epoch_fn,
    make_mlp_eval_fn,
)
from glnn_tpu.train.state import TrainState, create_train_state, make_adam
from glnn_tpu.train.losses import (
    log_softmax, nll_loss, kl_div_batchmean_log_target, accuracy,
)

__all__ = [
    "run_transductive", "run_inductive",
    "distill_run_transductive", "distill_run_inductive",
    "make_gnn_train_step", "make_eval_fn",
    "make_mlp_epoch_fn", "make_mlp_eval_fn",
    "TrainState", "create_train_state", "make_adam",
    "log_softmax", "nll_loss", "kl_div_batchmean_log_target", "accuracy",
]
