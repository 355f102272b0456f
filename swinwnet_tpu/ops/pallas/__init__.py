"""Pallas TPU kernels.

`swin_block` holds the fused whole-Swin-block kernels (the serving path:
LN -> W-MSA(+rel-pos bias) -> proj -> residual -> LN -> MLP -> residual in
one VMEM-resident grid step). The round-1 fused window-MSA-only kernel
(`window_msa.py`) was removed in round 3: it lost to the XLA bcast
formulation at every shipped shape and had a known hd=32 Mosaic miscompile
(PERFORMANCE.md, round-1 status); the whole-block kernels supersede it.

The round-4 glue kernels (`relayout.py`, `merge_expand.py`) were removed
in round 5 after their hardware A/Bs: relayout lost 36x to XLA's
transpose-cancellation, merge/expand are Mosaic-illegal (lane
interleave), and the LN kernel won standalone but lost in the full
pipeline — XLA fuses glue that standalone races price as real. See
PERFORMANCE.md "Round-5 measurement campaign"; git history retains the
kernels. The lesson is structural: hand kernels pay off only on units XLA
cannot fuse across (the whole residual block), never on glue fragments.
"""

from .swin_block import (
    fused_block_autodiff,
    fused_swin_block,
    fused_swin_block_cst,
    fused_swin_block_wide,
    swin_block_reference,
)

__all__ = [
    "fused_block_autodiff",
    "fused_swin_block",
    "fused_swin_block_cst",
    "fused_swin_block_wide",
    "swin_block_reference",
]
