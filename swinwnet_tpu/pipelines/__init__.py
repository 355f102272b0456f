from .inference import SwinWNetInference, inference_stages, STAGE_NAMES
from .rl_inference import RLInference, rl_inference_stages
from .simple import make_segmentation_fn, make_sr_fn

__all__ = [
    "SwinWNetInference",
    "inference_stages",
    "STAGE_NAMES",
    "RLInference",
    "rl_inference_stages",
    "make_segmentation_fn",
    "make_sr_fn",
]
