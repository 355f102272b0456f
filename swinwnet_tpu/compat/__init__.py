from .torch_import import (
    convert_state_dict,
    load_pth,
    unwrap_state_dict,
    sniff_error_matrix,
)

__all__ = ["convert_state_dict", "load_pth", "unwrap_state_dict", "sniff_error_matrix"]
