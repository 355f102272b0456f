"""Per-stage parameter freezing via optax.multi_transform.

The reference flips `requires_grad` on whole towers per training stage
(Segmentator_pretrain.py:78-93, Upscaler_pretrain.py:68-85,
RL_finetuning_pipline.py:85-101). In JAX, freezing is expressed as an optax
partition: trainable leaves get the real optimizer, frozen leaves get
`set_to_zero`, so the jitted step stays a single pure function.

Stage vocabularies (top-level module names of SwinWNet):
  stage1  train: patch_embed + segmentator_*          freeze: upscaler_*, ca_*
  stage2  train: upscaler_*                           freeze: rest
  stage3  train: everything
  rl      train: upscaler_* + ca_seg_to_sr            freeze: rest
"""

from __future__ import annotations

from typing import Callable, Dict

import optax

_STAGE_TRAINABLE: Dict[str, Callable[[str], bool]] = {
    "stage1": lambda top: top == "patch_embed" or top.startswith("segmentator_"),
    "stage2": lambda top: top.startswith("upscaler_"),
    "stage3": lambda top: True,
    "rl": lambda top: top.startswith("upscaler_") or top == "ca_seg_to_sr",
    "all": lambda top: True,
}


def stage_trainable_labels(params, stage: str):
    """Label pytree: 'train' / 'freeze' per leaf, keyed by top-level module."""
    pred = _STAGE_TRAINABLE[stage]

    def label_tree(tree, top=None):
        if isinstance(tree, dict):
            return {k: label_tree(v, top if top is not None else k) for k, v in tree.items()}
        return "train" if pred(top) else "freeze"

    return label_tree(params)


def masked_adamw(
    params,
    stage: str,
    learning_rate,
    weight_decay: float = 1e-4,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """AdamW over the stage's trainable partition; frozen leaves get zero
    updates (reference optimizer: Segmentator_pretrain.py:125-132)."""
    labels = stage_trainable_labels(params, stage)
    return optax.multi_transform(
        {
            "train": optax.adamw(learning_rate, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay),
            "freeze": optax.set_to_zero(),
        },
        labels,
    )
