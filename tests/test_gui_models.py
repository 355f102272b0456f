"""The interactive GUI behavior lives in toolkit-agnostic controllers
(apps/viewer_state.py, apps/labeler_state.py) — tested here headless. The Qt
shells (apps/gui.py) are thin wiring over these models and are smoke-tested
offscreen in CI where PySide6 is installed (tests/test_gui_qt.py).
"""

import os

import numpy as np
import pytest

from swinwnet_tpu.apps.labeler_state import LabelerModel, is_mask_array, normalize_to_stack
from swinwnet_tpu.apps.viewer_state import (
    ViewerModel,
    as_4d,
    is_seg_mask_stage,
    sorted_stage_names,
)
from swinwnet_tpu.data.generation import synthesize_pattern


# ---------------------------------------------------------------------------
# Viewer model
# ---------------------------------------------------------------------------


def _viewer_with_stages(tmp_path, B=3):
    """ViewerModel preloaded with a dict payload of fake stage arrays."""
    rng = np.random.default_rng(0)
    payload = {
        "images": rng.uniform(0, 100, (B, 1, 50, 60)).astype(np.float32),
        "seg_map_lr": rng.uniform(0, 1, (B, 1, 50, 60)).astype(np.float32),
        "upscaled_denorm": rng.uniform(0, 100, (B, 2, 100, 120)).astype(np.float32),
        "zzz_custom": rng.uniform(0, 1, (50, 60)).astype(np.float32),
        "not_an_array": None,
    }
    p = os.path.join(tmp_path, "stages.npy")
    np.save(p, payload, allow_pickle=True)
    m = ViewerModel()
    assert m.load_npy(p)
    return m


class TestViewerModel:
    def test_stage_ordering_and_helpers(self):
        names = ["zzz_custom", "seg_map_hr", "images", "alpha"]
        assert sorted_stage_names(names) == ["images", "seg_map_hr", "alpha", "zzz_custom"]
        assert is_seg_mask_stage("seg_map_lr") and is_seg_mask_stage("seg_map_extra")
        assert not is_seg_mask_stage("images_masked_hr")
        assert as_4d(np.zeros((5, 6))).shape == (1, 1, 5, 6)
        assert as_4d(np.zeros((2, 5, 6))).shape == (2, 1, 5, 6)

    def test_load_dict_payload(self, tmp_path):
        m = _viewer_with_stages(tmp_path)
        assert m.stage_order[0] == "images"
        assert "zzz_custom" in m.stage_order
        assert m.current_images is not None and m.current_images.shape == (3, 1, 50, 60)
        assert m.batch_size() == 3

    def test_load_raw_array(self, tmp_path):
        p = os.path.join(tmp_path, "raw.npy")
        np.save(p, np.ones((50, 60), np.float32))
        m = ViewerModel()
        assert m.load_npy(p)
        assert m.current_images.shape == (1, 1, 50, 60)
        assert m.stage_order == ["images"]

    def test_tiles_split_channels_except_masks(self, tmp_path):
        m = _viewer_with_stages(tmp_path)
        m.toggle_stage_selected("upscaled_denorm", True)
        m.toggle_stage_selected("seg_map_lr", True)
        tiles = m.tiles()
        by_stage = {t.title.split(" |")[0]: t for t in tiles}
        # 2-channel non-mask stage -> diffraction + error panels
        t = by_stage["upscaled_denorm"]
        assert t.right is not None and t.right_title == "Error"
        # mask stage -> single panel titled Mask
        t = by_stage["seg_map_lr"]
        assert t.right is None and t.left_title == "Mask"
        # tiles_per_stage expands samples
        m.tiles_per_stage = 3
        assert len(m.tiles()) == 6

    def test_curves_bands_and_visibility(self, tmp_path):
        m = _viewer_with_stages(tmp_path)
        m.toggle_stage_selected("images", True)
        m.toggle_stage_selected("upscaled_denorm", True)
        curves = {c.stage: c for c in m.curves()}
        assert curves["images"].err is None
        assert curves["upscaled_denorm"].err is not None  # channel-1 band
        assert (curves["upscaled_denorm"].err >= 0).all()
        assert curves["upscaled_denorm"].band_visible is False  # default OFF

        # legend toggles
        assert m.toggle_band("upscaled_denorm") is True
        assert {c.stage: c for c in m.curves()}["upscaled_denorm"].band_visible
        assert m.toggle_line("upscaled_denorm") is False
        c = {c.stage: c for c in m.curves()}["upscaled_denorm"]
        assert not c.line_visible and not c.band_visible  # band follows line

    def test_norm_1d_and_ylim(self, tmp_path):
        m = _viewer_with_stages(tmp_path)
        m.toggle_stage_selected("images", True)
        m.norm_1d = True
        c = m.curves()[0]
        assert float(np.max(c.I)) <= 1.0 + 1e-6
        assert m.ylim() == (0.0, 1.5)
        m.norm_1d = False
        assert m.ylim() is None  # auto
        m.auto_ylim = False
        m.ymin, m.ymax = 2.0, 1.0  # degenerate range guard
        lo, hi = m.ylim()
        assert hi > lo

    def test_d_grid_and_geometry_rebuild(self, tmp_path):
        m = _viewer_with_stages(tmp_path)
        m.toggle_stage_selected("images", True)
        n0 = len(m.curves()[0].d)
        m.apply_d_grid(0.1, 7.0, 333)
        assert len(m.curves()[0].d) == 333 != n0
        m.set_geometry((-90, 90), (0.5, 5.0))
        assert m.qw.theta_range == (-90.0, 90.0)

    def test_export_csv_visible_only(self, tmp_path):
        m = _viewer_with_stages(tmp_path)
        m.toggle_stage_selected("images", True)
        m.toggle_stage_selected("seg_map_lr", True)
        m.toggle_line("seg_map_lr")  # hide
        out = os.path.join(tmp_path, "curves.csv")
        assert m.export_csv(out) == 1
        with open(out) as f:
            header = f.readline().strip().split(",")
        assert header == ["d", "I_images"]

    def test_export_nothing_visible(self, tmp_path):
        m = _viewer_with_stages(tmp_path)
        m.toggle_stage_selected("images", True)
        m.toggle_line("images")
        assert m.export_csv(os.path.join(tmp_path, "x.csv")) == 0

    def test_full_flow_weights_to_csv(self, tmp_path):
        """load weights (.pth) -> load images -> run inference -> curves/CSV,
        the reference GUI's end-to-end flow (swinwnet_viewer_gui.py:714-803)."""
        torch = pytest.importorskip("torch")
        ref_path = "/root/reference/SwinWNet.py"
        if not os.path.exists(ref_path):
            pytest.skip("reference checkout not available")
        import importlib.util, sys

        spec = importlib.util.spec_from_file_location("ref_gui_flow", ref_path)
        ref = importlib.util.module_from_spec(spec)
        sys.modules["ref_gui_flow"] = ref
        spec.loader.exec_module(ref)
        torch.manual_seed(0)
        tmodel = ref.SwinWNet(
            in_chans=1, error_matrix=True, patch_size=2, embed_dim=48,
            depths=[2, 2, 2, 2], num_heads=[3, 6, 12, 24], window_size=5,
        )
        pth = os.path.join(tmp_path, "m.pth")
        torch.save(tmodel.state_dict(), pth)

        img = synthesize_pattern([1.5, 3.0], [1.0, 0.7], H=50, W=60, seed=3)
        npy = os.path.join(tmp_path, "img.npy")
        np.save(npy, img)

        m = ViewerModel()
        m.load_weights(pth)
        assert m.error_matrix is True
        assert m.load_npy(npy)
        assert m.run_inference()
        assert len(m.stage_order) == 8
        m.toggle_stage_selected("images", True)
        m.toggle_stage_selected("images_masked_hr", True)
        assert len(m.tiles()) == 2
        out = os.path.join(tmp_path, "c.csv")
        assert m.export_csv(out) == 2


# ---------------------------------------------------------------------------
# Labeler model
# ---------------------------------------------------------------------------


class TestLabelerModel:
    def test_mask_heuristics(self):
        assert is_mask_array(np.zeros((4, 5), np.uint8))
        assert is_mask_array(np.ones((4, 5), bool))
        assert not is_mask_array(np.zeros((4, 5), np.float32))
        assert not is_mask_array(np.arange(20).reshape(4, 5))
        assert normalize_to_stack(np.zeros((4, 5))).shape == (1, 4, 5)
        with pytest.raises(ValueError):
            normalize_to_stack(np.zeros((2, 2, 4, 5)))

    def _model_with_data(self, tmp_path, N=3, H=50, W=60):
        imgs = np.stack(
            [synthesize_pattern([1.2, 2.5], [2.0, 1.0], H=H, W=W, seed=i) for i in range(N)]
        )
        p = os.path.join(tmp_path, "diff.npy")
        np.save(p, imgs)
        m = LabelerModel()
        m.load_npy(p)
        return m

    def test_span_label_undo_clear(self, tmp_path):
        m = self._model_with_data(tmp_path)
        assert m.add_interval(2.6, 2.4)  # reversed drag is normalized
        assert m.intervals[0] == [(2.4, 2.6)]
        assert m.add_interval(1.0, 1.4)
        assert m.pop_interval()
        assert m.intervals[0] == [(2.4, 2.6)]
        m.clear_intervals_current()
        assert m.intervals[0] == []
        assert not m.pop_interval()  # nothing left to undo

    def test_profile_and_mask_projection(self, tmp_path):
        m = self._model_with_data(tmp_path)
        d, I = m.profile()
        assert d.shape == I.shape and I.sum() > 0
        # label the d=2.5 Bragg ridge; projected mask must cover its locus
        m.add_interval(2.45, 2.55)
        fm = m.current_final_mask()
        assert fm is not None and fm.any()
        dm = m.d_map()
        inside = (dm >= 2.45) & (dm <= 2.55)
        np.testing.assert_array_equal(fm.astype(bool), inside)

    def test_navigation_and_done_state(self, tmp_path):
        m = self._model_with_data(tmp_path, N=2)
        assert m.n_items() == 2 and not m.done()
        m.next_item()
        assert m.idx == 1
        m.next_item()
        assert m.done() and m.profile() is None
        m.next_item()  # parked at N
        assert m.idx == 2
        m.prev_item()
        assert m.idx == 1 and not m.done()

    def test_mode_toggle_guard(self, tmp_path):
        empty = LabelerModel()
        assert empty.toggle_mode() is False  # nothing loaded -> stays label mode
        m = self._model_with_data(tmp_path)
        assert m.toggle_mode() is True
        assert not m.add_interval(1, 2)  # view mode blocks labeling
        assert m.toggle_mode() is False

    def test_mask_roundtrip_and_save(self, tmp_path):
        m = self._model_with_data(tmp_path, N=3)
        m.add_interval(2.45, 2.55)  # image 0
        m.next_item()  # image 1: left empty
        m.next_item()  # image 2
        m.add_interval(1.15, 1.25)
        out = os.path.join(tmp_path, "masks.npy")
        assert m.save_masks(out) == 2  # only non-empty masks saved
        masks = np.load(out)
        idx = np.load(os.path.join(tmp_path, "masks_indices.npy"))
        assert masks.shape[0] == 2 and masks.dtype == np.uint8
        np.testing.assert_array_equal(idx, [0, 2])

        # loading saved masks back: recognized as masks, view mode offered
        m2 = LabelerModel()
        m2.load_npy(out)
        assert m2.base_masks is not None and m2.diffractions is None
        assert m2.mode_view is True

    def test_save_nothing(self, tmp_path):
        m = self._model_with_data(tmp_path)
        assert m.save_masks(os.path.join(tmp_path, "m.npy")) == 0

    def test_base_masks_or_intervals(self, tmp_path):
        m = self._model_with_data(tmp_path, N=2)
        base = np.zeros((2, 50, 60), np.uint8)
        base[0, :5, :5] = 1
        bp = os.path.join(tmp_path, "base.npy")
        np.save(bp, base)
        m.load_npy(bp)  # merges as base masks over existing diffractions
        assert m.base_masks is not None
        m.mode_view = False
        m.add_interval(2.45, 2.55)
        fm = m.current_final_mask()
        assert fm[:5, :5].all()  # base survives
        assert fm.sum() > 25  # plus the projected interval
