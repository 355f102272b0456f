"""Supervised trainers: pure jitted train steps + thin epoch drivers.

Reference semantics reproduced exactly:

* Stage 1 (`SegmentatorTrainer`, Segmentator_pretrain.py:9-282): train the
  segmentation tower on `segment_1` logits vs masks; upscaler + cross
  attentions frozen; AdamW + warmup-cosine, loss from the string registry.
* Stage 2 (`UpscalerTrainer`, Upscaler_pretrain.py:10-279): frozen-segmentator
  preprocess (stop_gradient) -> mask -> bilinear x0.5 -> piecewise-normalize
  LR & HR -> `upscale(norm_lr, skips)` vs `norm_hr`.
* Stage 3 (`FullModelTrainer`, FullModel_supervised_trainer.py:10-329):
  alternating even/odd batch objectives — even: seg loss + SR reconstruction
  of the x0.5-downscaled masked input; odd: seg loss + HR seg loss through the
  full SR -> denorm -> segment_2 path vs nearest-exact x2-upsampled masks.

Unlike the reference's eager loops, each step is ONE compiled function
(forward + backward + optimizer update); gradients flow exactly where torch
autograd lets them (stage 2's preprocess is under stop_gradient, stage 3's
mask/normalize path is differentiated through).

Mixed precision: every reference trainer runs under `torch.cuda.amp`
autocast + GradScaler (Segmentator_pretrain.py:5,65,184-190;
Upscaler_pretrain.py:6,58; FullModel_supervised_trainer.py:6,78,199). The
TPU analog is `compute_dtype=jnp.bfloat16`: the model's matmuls/convs run in
bf16 on the MXU while parameters, optimizer state, and losses stay fp32
(params are stored fp32 and cast per-op — models/layers.py), and gradients
come out fp32 through the cast's transpose. bf16's fp32 exponent range makes
a GradScaler unnecessary.

Steps take/return an explicit `TrainState` and are `pjit`-able over a data
mesh (see parallel/sharding.py and __graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax

from ..models.swin_wnet import SwinWNet
from ..ops.norms import ensure_2ch, normalize_piecewise, denormalize_piecewise
from ..ops.resize import bilinear_downscale_half, nearest_exact_resize
from .freeze import masked_adamw
from .losses import get_segmentation_loss, get_upscaler_loss
from .schedule import warmup_cosine_schedule


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation):
        return cls(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def _apply_updates(state: TrainState, grads, tx) -> TrainState:
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params=params, opt_state=opt_state, step=state.step + 1)


def _with_compute_dtype(model: SwinWNet, compute_dtype) -> SwinWNet:
    """Return the model (or a clone of it) with the requested compute dtype.

    `compute_dtype=jnp.bfloat16` is the AMP-autocast analog: the clone shares
    the parameter structure, so fp32 params flow through bf16 compute and the
    resulting grads are fp32 (see module docstring)."""
    if compute_dtype is None or model.dtype == compute_dtype:
        return model
    return model.clone(dtype=compute_dtype)


def _f32(x):
    """Losses and normalization statistics always run in fp32 (the torch-AMP
    convention: reductions leave autocast)."""
    return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Pure step factories
# ---------------------------------------------------------------------------


def make_stage1_step(model: SwinWNet, tx, loss_fn) -> Callable:
    """Segmentation pretrain step (Segmentator_pretrain.py:168-200)."""

    def loss_of(params, images, masks):
        seg, _ = model.apply({"params": params}, images, method=SwinWNet.segment_1)
        return loss_fn(_f32(seg), masks)

    @jax.jit
    def step(state: TrainState, images, masks):
        images = ensure_2ch(images)
        masks = masks[:, None] if masks.ndim == 3 else masks
        loss, grads = jax.value_and_grad(loss_of)(state.params, images, masks)
        return _apply_updates(state, grads, tx), loss

    return step


def make_stage1_eval(model: SwinWNet, loss_fn) -> Callable:
    @jax.jit
    def eval_step(params, images, masks):
        images = ensure_2ch(images)
        masks = masks[:, None] if masks.ndim == 3 else masks
        seg, _ = model.apply({"params": params}, images, method=SwinWNet.segment_1)
        return loss_fn(_f32(seg), masks)

    return eval_step


def _sr_preprocess(model, params, hr):
    """Frozen-segmentator preprocess (Upscaler_pretrain.py:188-208)."""
    seg, skips = model.apply({"params": params}, hr, method=SwinWNet.segment_1)
    seg = jax.nn.sigmoid(_f32(seg))
    hr_masked = seg * hr
    lr = bilinear_downscale_half(hr_masked)
    norm_lr, _ = normalize_piecewise(lr)
    norm_hr, _ = normalize_piecewise(hr_masked)
    return jax.lax.stop_gradient((norm_lr, norm_hr, skips))


def make_stage2_step(model: SwinWNet, tx, loss_fn) -> Callable:
    """SR pretrain step (Upscaler_pretrain.py:171-235)."""

    def loss_of(params, norm_lr, norm_hr, skips):
        pred, _ = model.apply({"params": params}, norm_lr, skips, method=SwinWNet.upscale)
        return loss_fn(_f32(pred), norm_hr)

    @jax.jit
    def step(state: TrainState, hr, _masks=None):
        hr = ensure_2ch(hr)
        norm_lr, norm_hr, skips = _sr_preprocess(model, state.params, hr)
        loss, grads = jax.value_and_grad(loss_of)(state.params, norm_lr, norm_hr, skips)
        return _apply_updates(state, grads, tx), loss

    return step


def make_stage2_eval(model: SwinWNet, loss_fn) -> Callable:
    @jax.jit
    def eval_step(params, hr, _masks=None):
        hr = ensure_2ch(hr)
        norm_lr, norm_hr, skips = _sr_preprocess(model, params, hr)
        pred, _ = model.apply({"params": params}, norm_lr, skips, method=SwinWNet.upscale)
        return loss_fn(_f32(pred), norm_hr)

    return eval_step


def make_stage3_steps(
    model: SwinWNet,
    tx,
    seg_loss_fn,
    sr_loss_fn,
    seg_weight_lr: float = 1.0,
    seg_weight_hr: float = 1.0,
    rec_weight: float = 1.0,
):
    """Joint even/odd steps (FullModel_supervised_trainer.py:231-288).
    Returns (even_step, odd_step); each returns (state, aux dict)."""

    def even_loss(params, images, masks):
        seg, skips_seg = model.apply({"params": params}, images, method=SwinWNet.segment_1)
        seg = _f32(seg)
        loss_seg = seg_loss_fn(seg, masks)

        seg_s = jax.nn.sigmoid(seg)
        images_masked = images * seg_s
        lr = bilinear_downscale_half(images_masked)
        norm_lr, _ = normalize_piecewise(lr)
        norm_hr, _ = normalize_piecewise(images_masked)

        sr_out, _ = model.apply({"params": params}, norm_lr, skips_seg, method=SwinWNet.upscale)
        rec = sr_loss_fn(_f32(sr_out), norm_hr)
        total = loss_seg * seg_weight_lr + rec * rec_weight
        return total, {"loss": total, "seg_lr": loss_seg, "rec": rec, "seg_hr": jnp.zeros(())}

    def odd_loss(params, images, masks):
        seg, skips_seg = model.apply({"params": params}, images, method=SwinWNet.segment_1)
        seg = _f32(seg)
        loss_low = seg_loss_fn(seg, masks)

        seg_s = jax.nn.sigmoid(seg)
        images_masked = seg_s * images
        norm_hr, params_hr = normalize_piecewise(images_masked)

        sr_out, skips_sr = model.apply({"params": params}, norm_hr, skips_seg, method=SwinWNet.upscale)
        denorm_pred = denormalize_piecewise(_f32(sr_out), params_hr)
        seg_high, _ = model.apply(
            {"params": params}, denorm_pred, skips_sr, method=SwinWNet.segment_2
        )
        seg_high = _f32(seg_high)
        masks_up = nearest_exact_resize(
            masks.astype(jnp.float32), masks.shape[-2] * 2, masks.shape[-1] * 2
        )
        loss_high = seg_loss_fn(seg_high, masks_up)
        total = loss_low * seg_weight_lr + loss_high * seg_weight_hr
        # per-epoch HR-IoU@0.50 diagnostic (not part of the reference loss; it
        # tracks whether the segment_2 path is learning vs collapsing to a
        # constant sigmoid band — see QUALITY_r02 HR analysis)
        pred_hr = (jax.nn.sigmoid(seg_high) > 0.5).astype(jnp.float32)
        inter = jnp.sum(pred_hr * masks_up)
        union = jnp.sum(jnp.maximum(pred_hr, masks_up))
        iou_hr = jax.lax.stop_gradient(inter / jnp.maximum(union, 1.0))
        return total, {"loss": total, "seg_lr": loss_low, "seg_hr": loss_high, "rec": jnp.zeros(()), "iou_hr": iou_hr}

    def make(loss_of):
        @jax.jit
        def step(state: TrainState, images, masks):
            images = ensure_2ch(images)
            masks = masks[:, None] if masks.ndim == 3 else masks
            (_, aux), grads = jax.value_and_grad(loss_of, has_aux=True)(
                state.params, images, masks
            )
            return _apply_updates(state, grads, tx), aux

        return step

    def make_eval(loss_of):
        @jax.jit
        def eval_step(params, images, masks):
            images = ensure_2ch(images)
            masks = masks[:, None] if masks.ndim == 3 else masks
            _, aux = loss_of(params, images, masks)
            return aux

        return eval_step

    return make(even_loss), make(odd_loss), make_eval(even_loss), make_eval(odd_loss)


# ---------------------------------------------------------------------------
# Epoch drivers (reference-shaped trainer classes)
# ---------------------------------------------------------------------------


class _BaseTrainer:
    """Shared epoch loop plumbing. `loader` is any iterable of (images, masks)
    numpy/jnp batch tuples with `len()`. `log_path` streams per-epoch JSONL
    metrics (utils.logging.MetricsLogger)."""

    def __init__(self, verbose=True, log_path=None, keep_best=False):
        from ..utils.logging import MetricsLogger

        self.verbose = verbose
        self.logger = MetricsLogger(log_path)
        self.history_train = []
        self.history_val = []
        # best-val model selection (no reference counterpart — the reference
        # evaluates whatever params the last epoch left behind, which the
        # QUALITY_r05 stage-3 trajectory showed can be the overfit worst-val
        # point). When enabled and a val loader exists, the epoch loop keeps
        # the params of the best-val epoch (a pytree reference — HBM-resident,
        # no host transfer) and restores them after the last epoch.
        self.keep_best = keep_best
        self._best_val = None
        self._best_params = None
        self.best_epoch = None

    def _track_best(self, val_loss: float):
        if not self.keep_best or val_loss != val_loss:  # disabled or NaN
            return
        if self._best_val is None or val_loss < self._best_val:
            self._best_val = val_loss
            self._best_params = self.state.params
            self.best_epoch = len(self.history_val)

    def _restore_best(self):
        if self.keep_best and self._best_params is not None:
            if self.verbose and self.state.params is not self._best_params:
                print(
                    f"restoring best-val params (epoch {self.best_epoch + 1}, "
                    f"val {self._best_val:.6f})"
                )
            self.state = TrainState(
                params=self._best_params,
                opt_state=self.state.opt_state,
                step=self.state.step,
            )
            self._best_params = None

    def release_training_state(self):
        """Analog of the reference teardown (Segmentator_pretrain.py:265-282):
        drop optimizer state so stage handoff starts clean."""
        self.state = TrainState(params=self.state.params, opt_state=None, step=self.state.step)
        self.tx = None

    # ---- fault tolerance (no reference counterpart; SURVEY.md §5) ----

    def save(self, directory: str) -> str:
        """Checkpoint the FULL train state (params + optimizer + step) so a
        crashed run resumes exactly (the reference only saves bare params)."""
        from ..utils.checkpoint import save_checkpoint

        return save_checkpoint(directory, self.state, step=int(self.state.step))

    def resume(self, directory: str) -> bool:
        """Restore the latest checkpoint in `directory` (False if none)."""
        from ..utils.checkpoint import latest_checkpoint, load_checkpoint

        path = latest_checkpoint(directory)
        if path is None:
            return False
        self.state = load_checkpoint(path, self.state)
        return True


class SegmentatorTrainer(_BaseTrainer):
    def __init__(
        self,
        model: SwinWNet,
        params,
        train_loader,
        val_loader=None,
        loss: str = "CombinedLoss",
        num_epochs: int = 300,
        warmup_epochs: int = 10,
        lr: float = 2e-4,
        weight_decay: float = 1e-4,
        compute_dtype=None,
        verbose: bool = True,
        log_path=None,
        keep_best: bool = False,
    ):
        super().__init__(verbose, log_path, keep_best)
        self.model = model
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.num_epochs = num_epochs
        loss_fn = get_segmentation_loss(loss)
        schedule = warmup_cosine_schedule(lr, warmup_epochs, num_epochs, max(len(train_loader), 1))
        self.tx = masked_adamw(params, "stage1", schedule, weight_decay)
        self.state = TrainState.create(params, self.tx)
        step_model = _with_compute_dtype(model, compute_dtype)
        self._step = make_stage1_step(step_model, self.tx, loss_fn)
        self._eval = make_stage1_eval(step_model, loss_fn)

    def train(self) -> Dict[str, list]:
        for epoch in range(self.num_epochs):
            total, n = 0.0, 0
            for images, masks in self.train_loader:
                self.state, loss = self._step(self.state, jnp.asarray(images), jnp.asarray(masks))
                b = images.shape[0]
                total += float(loss) * b
                n += b
            train_loss = total / max(n, 1)

            val_loss = float("nan")
            if self.val_loader is not None:
                vtotal, vn = 0.0, 0
                for images, masks in self.val_loader:
                    loss = self._eval(self.state.params, jnp.asarray(images), jnp.asarray(masks))
                    vtotal += float(loss) * images.shape[0]
                    vn += images.shape[0]
                val_loss = vtotal / max(vn, 1)

            self._track_best(val_loss)
            self.history_train.append(train_loss)
            self.history_val.append(val_loss)
            self.logger.log(epoch, train_loss=train_loss, val_loss=val_loss)
            if self.verbose:
                print(
                    f"Epoch [{epoch+1}/{self.num_epochs}] "
                    f"Train Loss: {train_loss:.6f} Val Loss: {val_loss:.6f}"
                )
        self._restore_best()
        return {"train_loss": self.history_train, "val_loss": self.history_val}


class UpscalerTrainer(_BaseTrainer):
    def __init__(
        self,
        model: SwinWNet,
        params,
        train_loader,
        val_loader=None,
        loss: str = "SmoothL1Loss",
        num_epochs: int = 50,
        warmup_epochs: int = 10,
        lr: float = 2e-4,
        weight_decay: float = 1e-4,
        compute_dtype=None,
        verbose: bool = True,
        log_path=None,
        keep_best: bool = False,
    ):
        super().__init__(verbose, log_path, keep_best)
        self.model = model
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.num_epochs = num_epochs
        loss_fn = get_upscaler_loss(loss)
        schedule = warmup_cosine_schedule(lr, warmup_epochs, num_epochs, max(len(train_loader), 1))
        self.tx = masked_adamw(params, "stage2", schedule, weight_decay)
        self.state = TrainState.create(params, self.tx)
        step_model = _with_compute_dtype(model, compute_dtype)
        self._step = make_stage2_step(step_model, self.tx, loss_fn)
        self._eval = make_stage2_eval(step_model, loss_fn)

    def train(self) -> Dict[str, list]:
        for epoch in range(self.num_epochs):
            total = 0.0
            for hr, masks in self.train_loader:
                self.state, loss = self._step(self.state, jnp.asarray(hr))
                total += float(loss)
            train_loss = total / max(len(self.train_loader), 1)

            val_loss = float("nan")
            if self.val_loader is not None:
                vtotal = 0.0
                for hr, masks in self.val_loader:
                    vtotal += float(self._eval(self.state.params, jnp.asarray(hr)))
                val_loss = vtotal / max(len(self.val_loader), 1)

            self._track_best(val_loss)
            self.history_train.append(train_loss)
            self.history_val.append(val_loss)
            self.logger.log(epoch, train_loss=train_loss, val_loss=val_loss)
            if self.verbose:
                print(
                    f"Epoch [{epoch+1}/{self.num_epochs}] "
                    f"Train Loss: {train_loss:.6f} Val Loss: {val_loss:.6f}"
                )
        self._restore_best()
        return {"train_loss": self.history_train, "val_loss": self.history_val}


class FullModelTrainer(_BaseTrainer):
    def __init__(
        self,
        model: SwinWNet,
        params,
        train_loader,
        val_loader=None,
        segmentator_loss: str = "CombinedLoss",
        upscaler_loss: str = "SmoothL1Loss",
        num_epochs: int = 100,
        warmup_epochs: int = 10,
        lr: float = 2e-4,
        weight_decay: float = 1e-4,
        seg_weight_lr: float = 1.0,
        seg_weight_hr: float = 1.0,
        rec_weight: float = 1.0,
        compute_dtype=None,
        verbose: bool = True,
        log_path=None,
        keep_best: bool = False,
    ):
        super().__init__(verbose, log_path, keep_best)
        self.model = model
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.num_epochs = num_epochs
        seg_fn = get_segmentation_loss(segmentator_loss)
        sr_fn = get_upscaler_loss(upscaler_loss)
        schedule = warmup_cosine_schedule(lr, warmup_epochs, num_epochs, max(len(train_loader), 1))
        self.tx = masked_adamw(params, "stage3", schedule, weight_decay)
        self.state = TrainState.create(params, self.tx)
        step_model = _with_compute_dtype(model, compute_dtype)
        self._even, self._odd, self._even_eval, self._odd_eval = make_stage3_steps(
            step_model, self.tx, seg_fn, sr_fn, seg_weight_lr, seg_weight_hr, rec_weight
        )

    def _run_epoch(self, loader, train: bool) -> Dict[str, float]:
        tot = {"loss": 0.0, "seg_lr": 0.0, "seg_hr": 0.0, "rec": 0.0}
        iou_hr_sum, n_odd = 0.0, 0
        for batch_idx, (images, masks) in enumerate(loader):
            images, masks = jnp.asarray(images), jnp.asarray(masks)
            is_even = batch_idx % 2 == 0
            if train:
                fn = self._even if is_even else self._odd
                self.state, aux = fn(self.state, images, masks)
            else:
                fn = self._even_eval if is_even else self._odd_eval
                aux = fn(self.state.params, images, masks)
            for k in tot:
                tot[k] += float(aux[k])
            if not is_even:
                iou_hr_sum += float(aux["iou_hr"])
                n_odd += 1
        n = max(len(loader), 1)
        out = {k: v / n for k, v in tot.items()}
        out["iou_hr"] = iou_hr_sum / max(n_odd, 1)
        return out

    def train(self) -> Dict[str, list]:
        for epoch in range(self.num_epochs):
            train_m = self._run_epoch(self.train_loader, train=True)
            val_m = (
                self._run_epoch(self.val_loader, train=False)
                if self.val_loader is not None
                else {k: float("nan") for k in ("loss", "seg_lr", "seg_hr", "rec")}
            )
            self._track_best(val_m["loss"])
            self.history_train.append(train_m)
            self.history_val.append(val_m)
            self.logger.log(epoch, **{f"train_{k}": v for k, v in train_m.items()})
            if self.verbose:
                print(
                    f"Epoch [{epoch+1}/{self.num_epochs}] "
                    f"Train {train_m['loss']:.4f} (seg_lr {train_m['seg_lr']:.4f} "
                    f"seg_hr {train_m['seg_hr']:.4f} rec {train_m['rec']:.4f} "
                    f"iou_hr {train_m['iou_hr']:.3f}) "
                    f"Val {val_m['loss']:.4f}"
                )
        self._restore_best()
        return {"train": self.history_train, "val": self.history_val}
