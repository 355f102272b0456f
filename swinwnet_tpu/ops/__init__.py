from .window import window_partition, window_reverse, compute_mask
from .resize import bilinear_resize, nearest_exact_resize, bilinear_downscale_half
from .norms import ensure_2ch, normalize_piecewise, denormalize_piecewise

__all__ = [
    "window_partition",
    "window_reverse",
    "compute_mask",
    "bilinear_resize",
    "nearest_exact_resize",
    "bilinear_downscale_half",
    "ensure_2ch",
    "normalize_piecewise",
    "denormalize_piecewise",
]
