from mm_masking_tpu.train.loss import (
    LossComponents,
    bce,
    eval_training_loss,
    eval_validation_loss,
    pose_errors,
)
from mm_masking_tpu.train.trainer import Trainer, TrainState, make_optimizer
from mm_masking_tpu.train.checkpoint import (
    save_checkpoint,
    restore_checkpoint,
    latest_epoch,
)
from mm_masking_tpu.train.metrics import MetricsLogger

__all__ = [
    "LossComponents",
    "bce",
    "eval_training_loss",
    "eval_validation_loss",
    "pose_errors",
    "Trainer",
    "TrainState",
    "make_optimizer",
    "save_checkpoint",
    "restore_checkpoint",
    "latest_epoch",
    "MetricsLogger",
]
