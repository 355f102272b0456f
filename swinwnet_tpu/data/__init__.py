from .loaders import ArrayLoader, load_crystal_npy, load_segmentation_maps, load_dataset_pickle
from .noise import add_eval_noise
from .real import (
    REAL_PATTERN_CRYSTALS,
    load_real_eval_set,
    load_real_masks,
    load_real_patterns,
    reference_available,
)

__all__ = [
    "ArrayLoader",
    "load_crystal_npy",
    "load_segmentation_maps",
    "load_dataset_pickle",
    "add_eval_noise",
    "REAL_PATTERN_CRYSTALS",
    "load_real_eval_set",
    "load_real_masks",
    "load_real_patterns",
    "reference_available",
]
