from .image_metrics import (
    binarize_prediction,
    confusion_matrix_binary,
    compute_all_metrics,
    segmentation_metrics_batch,
    psnr,
    ssim,
)
from .harness import MetricsCalculator, write_results_json, calculate_statistics
from .regression import load_baseline_arrays, compare_with_baseline, PUBLISHED
from .plots import plot_metric_distributions

__all__ = [
    "binarize_prediction",
    "confusion_matrix_binary",
    "compute_all_metrics",
    "segmentation_metrics_batch",
    "psnr",
    "ssim",
    "MetricsCalculator",
    "write_results_json",
    "calculate_statistics",
    "load_baseline_arrays",
    "compare_with_baseline",
    "PUBLISHED",
    "plot_metric_distributions",
]
