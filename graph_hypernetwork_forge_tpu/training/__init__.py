"""Training subsystem: objectives, train step, checkpointing."""

from graph_hypernetwork_forge_tpu.training.objectives import (
    link_prediction_loss,
    margin_ranking_loss,
    multi_negative_loss,
)
from graph_hypernetwork_forge_tpu.training.train import (
    TrainState,
    create_train_state,
    make_multi_step,
    make_train_step,
    train,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "link_prediction_loss",
    "make_multi_step",
    "make_train_step",
    "margin_ranking_loss",
    "multi_negative_loss",
    "train",
]
