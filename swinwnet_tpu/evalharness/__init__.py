from .image_metrics import (
    binarize_prediction,
    confusion_matrix_binary,
    compute_all_metrics,
    segmentation_metrics_batch,
    psnr,
    ssim,
)
from .harness import MetricsCalculator, write_results_json

__all__ = [
    "binarize_prediction",
    "confusion_matrix_binary",
    "compute_all_metrics",
    "segmentation_metrics_batch",
    "psnr",
    "ssim",
    "MetricsCalculator",
    "write_results_json",
]
