from .layers import (
    ScaleAwarePatchEmbed,
    WindowAttention,
    SwinTransformerBlock,
    BasicLayer,
    PatchMerging,
    PatchExpanding,
    SwinEncoder,
    Bottleneck,
    SwinDecoder,
    SegmentationHead,
    UpscalingHead,
    CrossAttentionBlock,
    MultiScaleCrossAttention,
)
from .swin_unet import SwinUNet, SwinUNetSR
from .swin_wnet import SwinWNet
from .alpha_policy import AlphaPolicy, apply_action

__all__ = [
    "ScaleAwarePatchEmbed",
    "WindowAttention",
    "SwinTransformerBlock",
    "BasicLayer",
    "PatchMerging",
    "PatchExpanding",
    "SwinEncoder",
    "Bottleneck",
    "SwinDecoder",
    "SegmentationHead",
    "UpscalingHead",
    "CrossAttentionBlock",
    "MultiScaleCrossAttention",
    "SwinUNet",
    "SwinUNetSR",
    "SwinWNet",
    "AlphaPolicy",
    "apply_action",
]
