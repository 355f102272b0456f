from .labeler import compute_d_map, make_fixed_centers, intervals_to_mask
from .viewer import ViewerSession, export_stage_csv, load_model_any

__all__ = [
    "compute_d_map",
    "make_fixed_centers",
    "intervals_to_mask",
    "ViewerSession",
    "export_stage_csv",
    "load_model_any",
]
