"""PyTorch .pth checkpoint -> flax params pytree converter.

Replicates the loader conveniences of the reference GUI
(inference_gui/swinwnet_viewer_gui.py:129-151): unwrapping nested
`state_dict` / `model_state_dict` keys, stripping the `module.` DataParallel
prefix, and sniffing multimodality from the patch-embed conv's input channels.

Key-mapping rules (torch -> flax):
  ModuleList indices   `layers.0.` -> `layers_0/` (same for blocks, downs,
                       ups, swin_blocks, linears)
  Sequential indices   `mlp.0/3` -> `mlp/fc1|fc2`, `seg_head.0/2` ->
                       `conv1|conv2`, `reconstruction.0/2` -> `conv1|conv2`,
                       AlphaPolicy `net.0/4` -> `conv|fc`
  torch MHA            `attn.in_proj_weight/bias` -> `in_proj_kernel|bias`,
                       `attn.out_proj` -> `out_proj`
  patch embed          `proj.weight/bias` -> `proj_kernel|proj_bias`
  leaf layout          Linear [out,in] -> kernel [in,out] (transpose);
                       Conv [out,in,kh,kw] -> kernel [kh,kw,in,out];
                       LayerNorm weight -> scale (ndim==1 weights)

Weights can be numpy arrays or torch tensors; torch is only imported lazily
so the package stays importable on torch-free deployments.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np


def unwrap_state_dict(obj: Mapping[str, Any]) -> Dict[str, Any]:
    """Unwrap {'state_dict': ...} / {'model_state_dict': ...} and strip the
    'module.' prefix (swinwnet_viewer_gui.py:129-143)."""
    for key in ("state_dict", "model_state_dict"):
        if key in obj and isinstance(obj[key], Mapping):
            obj = obj[key]
    out = {}
    for k, v in obj.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v
    return out


def sniff_error_matrix(state_dict: Mapping[str, Any]) -> bool:
    """Detect multimodal checkpoints from the embed conv's in-channels
    (swinwnet_viewer_gui.py:146-151)."""
    w = state_dict.get("patch_embed.proj.weight")
    if w is None:
        return False
    return int(np.asarray(w).shape[1]) >= 2


_LIST_MODULES = ("layers", "blocks", "downs", "ups", "swin_blocks", "linears")
_NORM_NAMES = ("norm", "norm1", "norm2", "norm_q", "norm_kv")


def _to_np(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor without importing torch
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _map_key(key: str, conv_proj_prefixes=frozenset()):
    """torch dotted key -> (flax path tuple, transform tag).

    `conv_proj_prefixes`: dotted prefixes whose `proj` child is the patch-embed
    *conv* (4-d weight) rather than an attention output *linear* — those params
    flatten to `proj_kernel` / `proj_bias` in the flax tree."""
    parts = key.split(".")

    # ModuleList flattening: <list>.<idx> -> <list>_<idx>
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p in _LIST_MODULES and i + 1 < len(parts) and parts[i + 1].isdigit():
            out.append(f"{p}_{parts[i+1]}")
            i += 2
        else:
            out.append(p)
            i += 1
    parts = out

    # Sequential renames
    joined = "/".join(parts)
    joined = re.sub(r"mlp/0/", "mlp/fc1/", joined)
    joined = re.sub(r"mlp/3/", "mlp/fc2/", joined)
    joined = re.sub(r"seg_head/0/", "conv1/", joined)
    joined = re.sub(r"seg_head/2/", "conv2/", joined)
    joined = re.sub(r"reconstruction/0/", "conv1/", joined)
    joined = re.sub(r"reconstruction/2/", "conv2/", joined)
    joined = re.sub(r"^net/0/", "conv/", joined)  # AlphaPolicy
    joined = re.sub(r"^net/4/", "fc/", joined)
    parts = joined.split("/")

    # MultiheadAttention packing
    if parts[-1] == "in_proj_weight":
        return tuple(parts[:-2] + ["in_proj_kernel"]), "linear_T"
    if parts[-1] == "in_proj_bias":
        return tuple(parts[:-2] + ["in_proj_bias"]), "copy"
    if len(parts) >= 3 and parts[-2] == "out_proj" and parts[-3] == "attn":
        # torch MHA attn/out_proj/* -> flax CrossAttentionBlock out_proj/*
        parts = parts[:-3] + parts[-2:]

    # Buffers to skip
    if parts[-1] == "relative_position_index":
        return None, "skip"

    leaf = parts[-1]
    parent = parts[-2] if len(parts) >= 2 else ""

    # patch embed conv params are flat names
    if parent == "proj" and ".".join(parts[:-2]) in conv_proj_prefixes:
        base = parts[:-2]
        if leaf == "weight":
            return tuple(base + ["proj_kernel"]), "conv_T"
        return tuple(base + ["proj_bias"]), "copy"

    if leaf == "weight":
        return tuple(parts), "auto_weight"  # decided by ndim
    return tuple(parts), "copy"


def convert_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """torch state_dict -> nested flax params dict (wrap as {'params': ...})."""
    state_dict = unwrap_state_dict(state_dict)
    tree: Dict[str, Any] = {}

    # pre-pass: which `<prefix>.proj.weight` tensors are 4-d convs (patch embed)
    conv_proj_prefixes = frozenset(
        key[: -len(".proj.weight")]
        for key, v in state_dict.items()
        if key.endswith(".proj.weight") and _to_np(v).ndim == 4
    ) | frozenset(
        [""] if "proj.weight" in state_dict and _to_np(state_dict["proj.weight"]).ndim == 4 else []
    )

    for key, value in state_dict.items():
        path, tag = _map_key(key, conv_proj_prefixes)
        if tag == "skip":
            continue
        arr = _to_np(value).astype(np.float32)

        if tag == "auto_weight":
            if arr.ndim == 1:  # LayerNorm weight
                path = path[:-1] + ("scale",)
            elif arr.ndim == 2:  # Linear
                arr = arr.T
                path = path[:-1] + ("kernel",)
            elif arr.ndim == 4:  # Conv [out,in,kh,kw] -> [kh,kw,in,out]
                arr = arr.transpose(2, 3, 1, 0)
                path = path[:-1] + ("kernel",)
            else:
                raise ValueError(f"unhandled weight ndim for {key}: {arr.shape}")
        elif tag == "linear_T":
            arr = arr.T
        elif tag == "conv_T":
            arr = arr.transpose(2, 3, 1, 0)

        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = arr

    return tree


def load_pth(path: str) -> Dict[str, Any]:
    """Load a .pth file and convert. Requires torch (CPU build is enough)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if not isinstance(obj, Mapping):
        obj = obj.state_dict()
    return convert_state_dict(obj)
