"""Native checkpointing via orbax.

The reference saves/loads raw `state_dict` pickles with no optimizer state
and no resume (SURVEY.md §5). Here checkpoints are orbax StandardCheckpointer
directories holding the full pytree (params and, if given, optimizer state +
step), enabling fault-tolerant resume; `latest_checkpoint` picks up the
newest step after a crash. PyTorch `.pth` import lives in `compat/`.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import orbax.checkpoint as ocp


def _path(directory: str, step: int) -> str:
    return os.path.join(os.path.abspath(directory), f"step_{step:08d}")


def save_checkpoint(directory: str, tree: Any, step: int = 0) -> str:
    os.makedirs(directory, exist_ok=True)
    path = _path(directory, step)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)
    return path


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            return ckptr.restore(path, target)
        return ckptr.restore(path)


def latest_checkpoint(directory: str) -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        m = re.fullmatch(r"step_(\d+)", name)
        if m:
            steps.append((int(m.group(1)), name))
    if not steps:
        return None
    return os.path.join(os.path.abspath(directory), max(steps)[1])
