from .losses import (
    dice_loss,
    tversky_loss,
    focal_tversky_loss,
    focal_bce,
    combined_loss,
    mse_loss,
    l1_loss,
    smooth_l1_loss,
    get_segmentation_loss,
    get_upscaler_loss,
)
from .schedule import warmup_cosine_schedule
from .freeze import stage_trainable_labels, masked_adamw
from .trainers import (
    SegmentatorTrainer,
    UpscalerTrainer,
    FullModelTrainer,
    TrainState,
)
from .pipeline import SwinWNetTrainingPipeline
from .rl import RLTrainer, make_rl_train_step

__all__ = [
    "dice_loss",
    "tversky_loss",
    "focal_tversky_loss",
    "focal_bce",
    "combined_loss",
    "mse_loss",
    "l1_loss",
    "smooth_l1_loss",
    "get_segmentation_loss",
    "get_upscaler_loss",
    "warmup_cosine_schedule",
    "stage_trainable_labels",
    "masked_adamw",
    "SegmentatorTrainer",
    "UpscalerTrainer",
    "FullModelTrainer",
    "TrainState",
    "SwinWNetTrainingPipeline",
    "RLTrainer",
    "make_rl_train_step",
]
