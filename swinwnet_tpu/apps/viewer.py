"""Headless inference viewer core (reference: inference_gui/
swinwnet_viewer_gui.py — the non-Qt parts).

Capabilities mirrored from the GUI:
* load `.npy` patterns — raw arrays or dict payloads (:598-664);
* load `.pth` weights with state-dict unwrap / `module.` strip and
  multimodality auto-detection from the embed conv (:129-151);
* run the staged inference pipeline and harvest all 8 stage tensors;
* rebin any stage to I(d) curves on an editable d-grid / geometry
  (QwrapperNP analog — our `physics.Qwrapper` is already numpy-compatible);
* CSV export of the I(d) curves (:1055-1088).

`python -m swinwnet_tpu.apps.viewer --weights m.pth --input p.npy --out dir/`
runs the whole thing from the command line.
"""

from __future__ import annotations

import argparse
import csv
import os
from typing import Dict, Tuple

import numpy as np

from ..compat.torch_import import convert_state_dict, sniff_error_matrix, unwrap_state_dict
from ..core.config import GEOMETRY
from ..data.loaders import load_crystal_npy
from ..models.swin_wnet import SwinWNet
from ..physics.qwrapper import Qwrapper, d_centers_hr, d_centers_lr
from ..pipelines.inference import STAGE_NAMES, SwinWNetInference


def load_model_any(weights_path: str) -> Tuple[SwinWNet, dict, bool]:
    """Build a SwinWNet matching a .pth checkpoint: unwraps/strips the state
    dict, sniffs `error_matrix` from the patch-embed in-channels
    (swinwnet_viewer_gui.py:146-151), converts to a flax tree."""
    import torch

    obj = torch.load(weights_path, map_location="cpu", weights_only=False)
    if not isinstance(obj, dict):
        obj = obj.state_dict()
    sd = unwrap_state_dict(obj)
    error_matrix = sniff_error_matrix(sd)
    model = SwinWNet(
        in_chans=1,
        error_matrix=error_matrix,
        embed_dim=48,
        depths=(2, 2, 2, 2),
        num_heads=(3, 6, 12, 24),
        window_size=5,
    )
    variables = {"params": convert_state_dict(sd)}
    return model, variables, error_matrix


class ViewerSession:
    """Stateful session: model + geometry + cached rebinners."""

    def __init__(
        self,
        model: SwinWNet,
        variables,
        theta_range=GEOMETRY.theta_range,
        lambda_range=GEOMETRY.lambda_range,
        d_centers_low=d_centers_lr,
        d_centers_high=d_centers_hr,
        split: bool = False,
    ):
        self.infer = SwinWNetInference(model, variables, split=split)
        self.theta_range = theta_range
        self.lambda_range = lambda_range
        self.qw_lr = Qwrapper(theta_range, lambda_range, fixed_centers=d_centers_low)
        self.qw_hr = Qwrapper(theta_range, lambda_range, fixed_centers=d_centers_high)

    def run(self, images: np.ndarray) -> Dict[str, np.ndarray]:
        """images: [H,W], [N,H,W] or [N,1,H,W] -> dict of all stage arrays."""
        images = np.asarray(images, np.float32)
        if images.ndim == 2:
            images = images[None]
        if images.ndim == 3:
            images = images[:, None]
        self.infer(images)
        return {name: np.asarray(getattr(self.infer, name)) for name in STAGE_NAMES}

    def curves(self, stage_array: np.ndarray, high_res: bool = False):
        """Stage [N, C, H, W] -> list of {d, I} dicts (diffraction channel)."""
        qw = self.qw_hr if high_res else self.qw_lr
        return qw.tensor_to_d(stage_array[:, 0:1])


def export_stage_csv(path: str, curves, sample_names=None):
    """I(d) curves -> CSV with d + one intensity column per sample
    (swinwnet_viewer_gui.py:1055-1088)."""
    if not curves:
        raise ValueError("no curves to export")
    d = curves[0]["d"]
    names = sample_names or [f"I_{i}" for i in range(len(curves))]
    with open(path, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["d"] + list(names))
        for i in range(len(d)):
            writer.writerow([float(d[i])] + [float(c["I"][i]) for c in curves])


def main(argv=None):
    from ..utils import enable_persistent_cache

    enable_persistent_cache()
    parser = argparse.ArgumentParser(description="SwinWNet-TPU headless inference viewer")
    parser.add_argument("--weights", required=True, help=".pth checkpoint")
    parser.add_argument("--input", required=True, help=".npy pattern (raw or dict)")
    parser.add_argument("--out", required=True, help="output directory")
    parser.add_argument("--theta", nargs=2, type=float, default=GEOMETRY.theta_range)
    parser.add_argument("--lam", nargs=2, type=float, default=GEOMETRY.lambda_range)
    parser.add_argument(
        "--split", action="store_true",
        help="compile the three towers as separate executables "
             "(pipelines/split.py) — ~3x lower peak compile memory for "
             "memory-constrained compile services",
    )
    args = parser.parse_args(argv)

    model, variables, error_matrix = load_model_any(args.weights)
    print(f"loaded {args.weights} (error_matrix={error_matrix})")

    session = ViewerSession(
        model, variables, tuple(args.theta), tuple(args.lam), split=args.split
    )
    images = load_crystal_npy(args.input)
    stages = session.run(images)

    os.makedirs(args.out, exist_ok=True)
    for name, arr in stages.items():
        np.save(os.path.join(args.out, f"{name}.npy"), arr)
    export_stage_csv(
        os.path.join(args.out, "input_id_curves.csv"), session.curves(stages["images"])
    )
    export_stage_csv(
        os.path.join(args.out, "masked_hr_id_curves.csv"),
        session.curves(stages["images_masked_hr"], high_res=True),
    )
    print(f"wrote {len(stages)} stage arrays + I(d) CSVs to {args.out}")


if __name__ == "__main__":
    main()
