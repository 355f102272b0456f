"""Evaluation harness reproducing the reference's `MetricsCalculator`
(tests.py:153-475): segmentation confusion metrics at thresholds
0.25/0.50/0.75 on LR and HR maps, PSNR/SSIM on the SR output (summary /
diffraction-only / error-only channels), and d-space physical metrics
(HR 1241-bin grid for predictions vs LR 832-bin grid for targets).

Differences from the reference (all TPU-motivated):
* the staged forward is the single jitted pipeline, not eight eager calls;
* per-sample metric loops are vmap-ed batch computations;
* results are returned as plain python structures AND writable in the exact
  `results/*.json` schema (`write_results_json`) so runs are comparable with
  the published baselines.
"""

from __future__ import annotations

import json
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models.swin_wnet import SwinWNet
from ..ops.norms import (
    denormalize_piecewise,
    denormalize_piecewise_notebook,
    ensure_2ch,
    normalize_piecewise,
    normalize_piecewise_notebook,
)
from ..ops.resize import bilinear_downscale_half, nearest_exact_resize
from ..physics import DiffractionMetricsCalculator, d_centers_hr, d_centers_lr
from ..pipelines.inference import make_inference_fn
from .image_metrics import psnr, segmentation_metrics_batch, ssim

METRIC_NAMES = ("PixelAccuracy", "IoU", "Dice", "Precision", "Recall")
THRESHOLDS = (0.25, 0.5, 0.75)


def calculate_statistics(data, metric_name: str, verbose: bool = True):
    """tests.py:78-91 (ddof=1 std)."""
    data = np.asarray(data)
    mean_val = float(np.mean(data)) if data.size else float("nan")
    std_val = float(np.std(data, ddof=1)) if data.size > 1 else float("nan")
    if verbose:
        print(f"{metric_name}: mean={mean_val:.4f} std={std_val:.4f} n={data.size}")
    return mean_val, std_val


def write_results_json(path: str, payload: Dict):
    """Dump metric arrays in the published results/*.json schema."""

    def tolist(x):
        if isinstance(x, dict):
            return {k: tolist(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return [tolist(v) for v in x]
        if hasattr(x, "tolist"):
            return x.tolist()
        return x

    with open(path, "w") as f:
        json.dump(tolist(payload), f)


class MetricsCalculator:
    """Drives the jitted inference pipeline over a loader and aggregates
    segmentation / SR / physical metric distributions."""

    def __init__(
        self,
        model: SwinWNet,
        variables,
        val_loader,
        verbose: bool = True,
        policy=None,
        policy_variables=None,
        norm_convention: str = "reference",
    ):
        """`policy`/`policy_variables`: optional trained AlphaPolicy — when
        given, the SR branch applies the deterministic action mu after
        `upscale`, matching the RL inference pipeline
        (RL_Inference_Pipline.py:113-121), so post-RL-fine-tune metrics run
        through the same harness as the supervised ones.

        `norm_convention`: "reference" (default) = the tests.py /
        ST_Inference_Pipline norm pair (exact inverse; what the models are
        trained with); "notebook" = the Physycal_metrics_test.ipynb pair
        (/log1p(1) norm + plain expm1 denorm — intentionally non-inverse; see
        ops.norms.normalize_piecewise_notebook). The four published
        *_physycal_metrics_extended.json baselines were produced under the
        notebook convention, so physical-metric comparisons against them must
        use it; segmentation and PSNR/SSIM baselines came through tests.py
        and keep the reference convention either way."""
        self.model = model
        self.variables = variables
        self.val_loader = val_loader
        self.verbose = verbose
        self._infer = make_inference_fn(model)

        self.d_centers_lr = d_centers_lr
        self.d_centers_hr = d_centers_hr
        self.physical = DiffractionMetricsCalculator(
            fixed_centers_pred=self.d_centers_hr, fixed_centers_true=self.d_centers_lr
        )

        if norm_convention == "notebook":
            _norm, _denorm = normalize_piecewise_notebook, denormalize_piecewise_notebook
        elif norm_convention == "reference":
            _norm, _denorm = normalize_piecewise, denormalize_piecewise
        else:
            raise ValueError(f"unknown norm_convention {norm_convention!r}")

        # SR-branch forward shared by upscaler/physical evals (tests.py:326-347)
        @jax.jit
        def sr_forward(variables, images):
            images = ensure_2ch(images)
            seg, skips_seg = model.apply(variables, images, method=SwinWNet.segment_1)
            seg = jax.nn.sigmoid(seg)
            images = images * seg
            images_downscaled = bilinear_downscale_half(images)
            norm_downscaled, _ = _norm(images_downscaled)
            norm_images, params_images = _norm(images)
            sr_out, _ = model.apply(variables, norm_downscaled, skips_seg, method=SwinWNet.upscale)
            if policy is not None:
                from ..models.alpha_policy import apply_action

                mu, _std = policy.apply(policy_variables, norm_downscaled)
                sr_out = apply_action(sr_out, mu)
            denorm_sr_out = _denorm(sr_out, params_images)
            return images_downscaled, norm_images, sr_out, denorm_sr_out

        self._sr_forward = sr_forward

    # ------------------------------------------------------------------
    def CalculateSegmentationMetrics(self) -> Dict:
        """tests.py:212-305. Returns {'Low Res'/'High Res': {'<t> thrashold':
        [per-sample dicts]}} (schema-compatible, including the key spelling)."""
        acc = {res: {t: [] for t in THRESHOLDS} for res in ("lr", "hr")}

        for images, masks in self.val_loader:
            images = jnp.asarray(images)
            masks = jnp.asarray(masks)
            masks = masks[:, None] if masks.ndim == 3 else masks
            stages = self._infer(self.variables, images)
            masks_up = nearest_exact_resize(masks, masks.shape[-2] * 2, masks.shape[-1] * 2)

            for t in THRESHOLDS:
                lr = segmentation_metrics_batch(stages["seg_map_lr"], masks, threshold=t)
                hr = segmentation_metrics_batch(stages["seg_map_hr"], masks_up, threshold=t)
                B = images.shape[0]
                for b in range(B):
                    acc["lr"][t].append({k: float(lr[k][b]) for k in METRIC_NAMES})
                    acc["hr"][t].append({k: float(hr[k][b]) for k in METRIC_NAMES})

        all_metrics = {
            "Low Res": {f"{t:.2f} thrashold": acc["lr"][t] for t in THRESHOLDS},
            "High Res": {f"{t:.2f} thrashold": acc["hr"][t] for t in THRESHOLDS},
        }
        if self.verbose:
            for res_name, key in (("Low Res", "lr"), ("High Res", "hr")):
                print(f"\n== Segmentation Metrics {res_name} ==")
                for name in METRIC_NAMES:
                    for t in THRESHOLDS:
                        arr = np.array([m[name] for m in acc[key][t]])
                        calculate_statistics(arr, f"{t:.2f} threshold {name}")
        return all_metrics

    # ------------------------------------------------------------------
    def CalculateUpscalerMetrics(self) -> Dict:
        """tests.py:307-399: PSNR/SSIM on clamped [0,1] normalized SR output
        vs normalized GT, per sample, for all/ch0/ch1 channels."""
        out = {
            "Summary Metrics": {"PSNR": [], "SSIM": []},
            "Only Diffraction Metrics": {"PSNR": [], "SSIM": []},
            "Only Error Matrix Metrics": {"PSNR": [], "SSIM": []},
        }

        for images, _ in self.val_loader:
            images = jnp.asarray(images)
            _, norm_images, sr_out, _ = self._sr_forward(self.variables, images)
            gt = jnp.clip(norm_images, 0, 1)
            pred = jnp.clip(sr_out, 0, 1)

            for b in range(gt.shape[0]):
                g, p = gt[b : b + 1], pred[b : b + 1]
                out["Summary Metrics"]["PSNR"].append(float(psnr(g, p)))
                out["Summary Metrics"]["SSIM"].append(float(ssim(g, p)))
                out["Only Diffraction Metrics"]["PSNR"].append(float(psnr(g[:, 0:1], p[:, 0:1])))
                out["Only Diffraction Metrics"]["SSIM"].append(float(ssim(g[:, 0:1], p[:, 0:1])))
                if g.shape[1] > 1:
                    out["Only Error Matrix Metrics"]["PSNR"].append(
                        float(psnr(g[:, 1:2], p[:, 1:2]))
                    )
                    out["Only Error Matrix Metrics"]["SSIM"].append(
                        float(ssim(g[:, 1:2], p[:, 1:2]))
                    )

        if self.verbose:
            for section, vals in out.items():
                print(f"\n== {section} ==")
                for k, arr in vals.items():
                    calculate_statistics(arr, k)
        return out

    # ------------------------------------------------------------------
    def CalculatePhysycalMetrics(self) -> Dict:
        """tests.py:402-475: d-space metrics of the denormalized SR output
        (HR grid, scale=True) vs the x0.5-downscaled masked input (LR grid)."""
        all_metrics = {"integral": [], "peak": [], "shape": []}

        for images, _ in self.val_loader:
            images = jnp.asarray(images)
            images_downscaled, _, _, denorm_sr_out = self._sr_forward(self.variables, images)

            allm = self.physical(
                batch_pred_2d=np.asarray(denorm_sr_out[:, 0:1]),
                batch_true_2d=np.asarray(images_downscaled[:, 0:1]),
                peak_params_pred={"scale": True},
                peak_params_true={"scale": False},
                tol=0.05,
            )
            all_metrics["integral"].append(np.asarray(allm["Integral Intensity"]))
            all_metrics["peak"].append(np.asarray(allm["Peak Intensity"]))
            all_metrics["shape"].append(np.asarray(allm["Shape"]))

        for k in all_metrics:
            all_metrics[k] = (
                np.concatenate(all_metrics[k], axis=0) if all_metrics[k] else np.array([])
            )
        if self.verbose:
            calculate_statistics(all_metrics["integral"], "Integral intensity")
            calculate_statistics(all_metrics["peak"], "Peak intensity")
            calculate_statistics(all_metrics["shape"], "Peak shape")
        return all_metrics
