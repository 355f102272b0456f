"""Apps layer: headless viewer E2E with a real .pth checkpoint roundtrip."""

import os
import tempfile

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_MODEL = "/root/reference/SwinWNet.py"


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(REF_MODEL), reason="reference checkout not available")
def test_viewer_cli_end_to_end():
    """Save a torch checkpoint, run the viewer CLI, check stage + CSV outputs."""
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location("ref_swinwnet_apps", REF_MODEL)
    ref = importlib.util.module_from_spec(spec)
    sys.modules["ref_swinwnet_apps"] = ref
    spec.loader.exec_module(ref)

    torch.manual_seed(0)
    tmodel = ref.SwinWNet(
        in_chans=1,
        error_matrix=True,
        patch_size=2,
        embed_dim=48,
        depths=[2, 2, 2, 2],
        num_heads=[3, 6, 12, 24],
        window_size=5,
    )

    from swinwnet_tpu.apps.viewer import main
    from swinwnet_tpu.data.generation import synthesize_pattern

    with tempfile.TemporaryDirectory() as d:
        pth = os.path.join(d, "model.pth")
        # wrapped + DataParallel-prefixed, like checkpoints in the wild
        torch.save(
            {"state_dict": {"module." + k: v for k, v in tmodel.state_dict().items()}}, pth
        )
        pattern = synthesize_pattern([1.5, 3.0], [1.0, 1.0], H=50, W=60, seed=1)
        npy = os.path.join(d, "pattern.npy")
        np.save(npy, pattern)

        out = os.path.join(d, "out")
        main(["--weights", pth, "--input", npy, "--out", out])

        stages = sorted(os.listdir(out))
        assert "seg_map_lr.npy" in stages
        assert "images_masked_hr.npy" in stages
        assert "input_id_curves.csv" in stages
        hr = np.load(os.path.join(out, "images_masked_hr.npy"))
        assert hr.shape == (1, 2, 100, 120)
        csv_text = open(os.path.join(out, "input_id_curves.csv")).read()
        assert csv_text.startswith("d,")


def test_load_crystal_npy_dict_payload(tmp_path):
    from swinwnet_tpu.data.loaders import load_crystal_npy

    arr = np.ones((5, 6), np.float32)
    p = tmp_path / "x.npy"
    np.save(p, {"diffraction": arr})
    got = load_crystal_npy(str(p))
    np.testing.assert_array_equal(got, arr)

    p2 = tmp_path / "raw.npy"
    np.save(p2, arr)
    np.testing.assert_array_equal(load_crystal_npy(str(p2)), arr)
