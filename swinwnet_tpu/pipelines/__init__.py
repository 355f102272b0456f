from .inference import SwinWNetInference, inference_stages, STAGE_NAMES
from .rl_inference import RLInference, rl_inference_stages

__all__ = [
    "SwinWNetInference",
    "inference_stages",
    "STAGE_NAMES",
    "RLInference",
    "rl_inference_stages",
]
