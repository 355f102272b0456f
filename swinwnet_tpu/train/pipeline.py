"""3-stage supervised training orchestrator
(reference: Supervised_train_full_pipline.py:5-129).

Runs SegmentatorTrainer -> UpscalerTrainer -> FullModelTrainer sequentially on
one parameter pytree, releasing optimizer state between stages. Two reference
paper-cuts are fixed (and documented): stage 2 now receives `sr_epochs`
(the reference passes `seg_epochs` at :98) and stage 3 receives `lr`
(the reference passes a nonexistent `base_lr` kwarg at :125).
"""

from __future__ import annotations

from typing import Dict

from ..models.swin_wnet import SwinWNet
from .trainers import FullModelTrainer, SegmentatorTrainer, UpscalerTrainer


class SwinWNetTrainingPipeline:
    def __init__(
        self,
        model: SwinWNet,
        params,
        train_loader,
        val_loader=None,
        seg_loss: str = "CombinedLoss",
        sr_loss: str = "SmoothL1Loss",
        seg_epochs: int = 300,
        sr_epochs: int = 50,
        full_epochs: int = 100,
        warmup_epochs: int = 10,
        lr: float = 2e-4,
        weight_decay: float = 1e-4,
        seg_weight_lr: float = 1.0,
        seg_weight_hr: float = 1.0,
        rec_weight: float = 1.0,
        compute_dtype=None,
        keep_best: bool = False,
        verbose: bool = True,
    ):
        self.model = model
        self.params = params
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.cfg = dict(
            seg_loss=seg_loss,
            sr_loss=sr_loss,
            seg_epochs=seg_epochs,
            sr_epochs=sr_epochs,
            full_epochs=full_epochs,
            warmup_epochs=warmup_epochs,
            lr=lr,
            weight_decay=weight_decay,
            seg_weight_lr=seg_weight_lr,
            seg_weight_hr=seg_weight_hr,
            rec_weight=rec_weight,
            compute_dtype=compute_dtype,
            keep_best=keep_best,
        )
        self.verbose = verbose
        self.histories: Dict[str, dict] = {}

    def run(self):
        c = self.cfg

        if self.verbose:
            print("=== Stage 1: segmentator pretrain ===")
        t1 = SegmentatorTrainer(
            self.model,
            self.params,
            self.train_loader,
            self.val_loader,
            loss=c["seg_loss"],
            num_epochs=c["seg_epochs"],
            warmup_epochs=c["warmup_epochs"],
            lr=c["lr"],
            weight_decay=c["weight_decay"],
            compute_dtype=c["compute_dtype"],
            keep_best=c["keep_best"],
            verbose=self.verbose,
        )
        self.histories["stage1"] = t1.train()
        self.params = t1.state.params
        t1.release_training_state()

        if self.verbose:
            print("=== Stage 2: upscaler pretrain ===")
        t2 = UpscalerTrainer(
            self.model,
            self.params,
            self.train_loader,
            self.val_loader,
            loss=c["sr_loss"],
            num_epochs=c["sr_epochs"],
            warmup_epochs=c["warmup_epochs"],
            lr=c["lr"],
            weight_decay=c["weight_decay"],
            compute_dtype=c["compute_dtype"],
            keep_best=c["keep_best"],
            verbose=self.verbose,
        )
        self.histories["stage2"] = t2.train()
        self.params = t2.state.params
        t2.release_training_state()

        if self.verbose:
            print("=== Stage 3: joint fine-tune ===")
        t3 = FullModelTrainer(
            self.model,
            self.params,
            self.train_loader,
            self.val_loader,
            segmentator_loss=c["seg_loss"],
            upscaler_loss=c["sr_loss"],
            num_epochs=c["full_epochs"],
            warmup_epochs=c["warmup_epochs"],
            lr=c["lr"],
            weight_decay=c["weight_decay"],
            seg_weight_lr=c["seg_weight_lr"],
            seg_weight_hr=c["seg_weight_hr"],
            rec_weight=c["rec_weight"],
            compute_dtype=c["compute_dtype"],
            keep_best=c["keep_best"],
            verbose=self.verbose,
        )
        self.histories["stage3"] = t3.train()
        self.params = t3.state.params
        t3.release_training_state()

        return self.params, self.histories
