"""Training layer: losses, schedules, metrics, jitted train/eval steps,
vote-TTA, and orbax checkpointing."""

from mpa_tpu.train.losses import (
    smooth_cls_loss,
    cls_loss,
    smooth_seg_loss,
    chamfer_distance,
    completion_loss,
    mi_aux_loss,
)
from mpa_tpu.train.schedules import step_decay_schedule, cosine_schedule
from mpa_tpu.train.metrics import (
    instance_accuracy,
    class_average_accuracy,
    part_iou_metrics,
)
from mpa_tpu.train.loop import (
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
    make_optimizer,
)
from mpa_tpu.train import metrics

__all__ = [
    "smooth_cls_loss",
    "cls_loss",
    "smooth_seg_loss",
    "chamfer_distance",
    "completion_loss",
    "mi_aux_loss",
    "step_decay_schedule",
    "cosine_schedule",
    "instance_accuracy",
    "class_average_accuracy",
    "part_iou_metrics",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "make_optimizer",
    "metrics",
]
