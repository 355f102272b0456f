"""Qt GUI shells (reference: inference_gui/swinwnet_viewer_gui.py and
DiffractionLabeler/diffraction_labeling_gui/diff_labeling_gui.py).

The GUIs' physics and inference logic live headless in `apps.viewer` and
`apps.labeler`; this module provides the interactive shells when PySide6 +
matplotlib are installed (they are optional dependencies — the TPU serving
image ships without a display stack). Launch:

    python -m swinwnet_tpu.apps.gui viewer
    python -m swinwnet_tpu.apps.gui labeler
"""

from __future__ import annotations

import sys


def _require_qt():
    try:
        import PySide6  # noqa: F401
        import matplotlib  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "The GUI shells require PySide6 + matplotlib (pip install "
            "'swinwnet-tpu[gui]'). All functionality is available headless: "
            "`python -m swinwnet_tpu.apps.viewer` for inference + I(d) export, "
            "and `swinwnet_tpu.apps.labeler` for interval -> mask projection."
        ) from e


def run_viewer():
    """Interactive viewer: load .npy/.pth, run the 8-stage pipeline, browse
    stage tiles + I(d) curves with error bands, export CSV."""
    _require_qt()
    from PySide6.QtWidgets import QApplication  # noqa: F401

    raise NotImplementedError(
        "Qt viewer shell lands in a future round; use the headless "
        "`swinwnet_tpu.apps.viewer` CLI which covers stage export and "
        "I(d) CSV output."
    )


def run_labeler():
    """Interactive labeler: SpanSelector intervals on the I(d) profile,
    projected to 2D masks via apps.labeler.intervals_to_mask."""
    _require_qt()
    raise NotImplementedError(
        "Qt labeler shell lands in a future round; the projection core is "
        "`swinwnet_tpu.apps.labeler` (compute_d_map / intervals_to_mask / "
        "label_batch / save_labels)."
    )


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    which = argv[0] if argv else "viewer"
    if which == "viewer":
        run_viewer()
    elif which == "labeler":
        run_labeler()
    else:
        raise SystemExit(f"unknown app {which!r}; choose 'viewer' or 'labeler'")


if __name__ == "__main__":
    main()
