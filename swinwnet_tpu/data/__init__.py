from .loaders import ArrayLoader, load_crystal_npy, load_segmentation_maps, load_dataset_pickle
from .noise import add_eval_noise

__all__ = [
    "ArrayLoader",
    "load_crystal_npy",
    "load_segmentation_maps",
    "load_dataset_pickle",
    "add_eval_noise",
]
