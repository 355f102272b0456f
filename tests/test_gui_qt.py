"""Offscreen smoke tests of the Qt shells (apps/gui.py).

Skipped when PySide6 is absent (the TPU serving image); CI installs PySide6
and runs these with QT_QPA_PLATFORM=offscreen (.github/workflows/ci.yml).
The shells are thin wiring over the headless controllers, which carry the
real behavioral coverage (tests/test_gui_models.py).
"""

import os

import numpy as np
import pytest

pytest.importorskip("PySide6")

os.environ.setdefault("QT_QPA_PLATFORM", "offscreen")

from PySide6.QtWidgets import QApplication  # noqa: E402

from swinwnet_tpu.data.generation import synthesize_pattern  # noqa: E402


@pytest.fixture(scope="module")
def qapp():
    app = QApplication.instance() or QApplication([])
    yield app


def test_viewer_window_smoke(qapp, tmp_path):
    from swinwnet_tpu.apps.gui import build_viewer_window

    win, model = build_viewer_window()
    win.resize(1200, 800)
    win.show()

    payload = {
        "images": np.stack(
            [synthesize_pattern([1.5, 3.0], [1.0, 0.7], H=50, W=60, seed=i) for i in range(2)]
        )[:, None],
        "seg_map_lr": np.random.default_rng(0).uniform(0, 1, (2, 1, 50, 60)).astype(np.float32),
    }
    p = str(tmp_path / "stages.npy")
    np.save(p, payload, allow_pickle=True)

    win.load_npy(p)
    assert model.stage_order == ["images", "seg_map_lr"]
    assert set(win._stage_buttons) == {"images", "seg_map_lr"}

    # select stages via the toolbar buttons -> tiles + curves render
    win._stage_buttons["images"].setChecked(True)
    win._stage_buttons["seg_map_lr"].setChecked(True)
    qapp.processEvents()
    assert model.selected_stages == ["images", "seg_map_lr"]
    assert win.tiles_grid.count() >= 2
    assert set(win._lines) == {"images", "seg_map_lr"}

    # view options round-trip through widgets
    win.chk_norm1d.setChecked(True)
    qapp.processEvents()
    assert model.norm_1d is True

    # d-grid edit rebuilds the rebinner
    win.spin_dn.setValue(333)
    win.apply_d_grid()
    assert model.fixed_centers.size == 333

    # CSV export through the window (dialog patched)
    out = str(tmp_path / "curves.csv")
    win._file_dialog = type(
        "FD", (), {"getSaveFileName": staticmethod(lambda *a, **k: (out, ""))}
    )
    win.export_csv()
    assert os.path.exists(out)
    win.close()


def test_labeler_window_smoke(qapp, tmp_path):
    from swinwnet_tpu.apps.gui import build_labeler_window

    win, model = build_labeler_window()
    win.resize(1000, 700)
    win.show()

    imgs = np.stack(
        [synthesize_pattern([1.2, 2.5], [2.0, 1.0], H=50, W=60, seed=i) for i in range(2)]
    )
    p = str(tmp_path / "diff.npy")
    np.save(p, imgs)
    win.load_npy(p)
    assert model.diffractions.shape == (2, 50, 60)

    # simulate the SpanSelector callback + right-click undo
    win._on_span(2.45, 2.55)
    assert model.intervals[0] == [(2.45, 2.55)]
    win._on_span(1.0, 1.2)

    class FakeEvent:
        inaxes = win.canvas.ax_prof
        button = 3

    win._on_click(FakeEvent())
    assert model.intervals[0] == [(2.45, 2.55)]

    win.next_item()
    assert model.idx == 1
    win.toggle_mode()
    assert model.mode_view is True
    win.toggle_mode()

    out = str(tmp_path / "masks.npy")
    win._file_dialog = type(
        "FD", (), {"getSaveFileName": staticmethod(lambda *a, **k: (out, ""))}
    )
    win.save_masks()
    assert os.path.exists(out)
    assert np.load(out).shape[0] == 1  # only the labeled image saved
    win.close()
