"""End-to-end parity of the jitted 8-stage pipeline vs the reference
`ST_Inference_Pipline.SwinWNetInference` (the BASELINE north-star flow),
plus the RL-augmented variant.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REF_DIR = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_DIR, "ST_Inference_Pipline.py")),
    reason="reference checkout not available",
)

torch = pytest.importorskip("torch")

H, W = 50, 60
CFG = dict(patch_size=2, embed_dim=48, depths=[2, 2, 2, 2], num_heads=[3, 6, 12, 24], window_size=5)


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_modules():
    sys.path.insert(0, REF_DIR)
    try:
        ref_model = _load(os.path.join(REF_DIR, "SwinWNet.py"), "SwinWNet")
        ref_pipe = _load(os.path.join(REF_DIR, "ST_Inference_Pipline.py"), "ref_st_pipe")
        ref_policy = _load(os.path.join(REF_DIR, "RL_policy.py"), "RL_policy")
        ref_rl_pipe = _load(os.path.join(REF_DIR, "RL_Inference_Pipline.py"), "ref_rl_pipe")
    finally:
        sys.path.remove(REF_DIR)
    return ref_model, ref_pipe, ref_policy, ref_rl_pipe


def test_st_pipeline_parity(ref_modules):
    ref_model, ref_pipe, _, _ = ref_modules
    from swinwnet_tpu.compat import convert_state_dict
    from swinwnet_tpu.models import SwinWNet
    from swinwnet_tpu.pipelines import SwinWNetInference

    torch.manual_seed(7)
    tmodel = ref_model.SwinWNet(in_chans=1, error_matrix=True, **CFG).eval()
    tinfer = ref_pipe.SwinWNetInference(tmodel, "cpu")

    jmodel = SwinWNet(
        in_chans=1, error_matrix=True,
        **{**CFG, "depths": tuple(CFG["depths"]), "num_heads": tuple(CFG["num_heads"])},
    )
    jinfer = SwinWNetInference(jmodel, {"params": convert_state_dict(tmodel.state_dict())})

    x = np.random.default_rng(7).uniform(0, 100, size=(2, 1, H, W)).astype(np.float32)
    with torch.no_grad():
        tout = tinfer(torch.from_numpy(x))
    jout = jinfer(x)

    for name in (
        "images",
        "seg_map_lr",
        "images_masked_lr",
        "norm",
        "upscaled_norm",
        "upscaled_denorm",
        "seg_map_hr",
        "images_masked_hr",
    ):
        want = getattr(tinfer, name).numpy()
        got = np.asarray(getattr(jinfer, name))
        assert got.shape == want.shape, name
        denom = max(np.abs(want).max(), 1e-6)
        err = np.abs(got - want).max() / denom
        assert err < 1e-3, f"{name}: rel err {err:.2e}"

    np.testing.assert_allclose(np.asarray(jout), tout.numpy(), rtol=0, atol=1e-3 * np.abs(tout.numpy()).max())


def test_rl_pipeline_parity(ref_modules):
    ref_model, _, ref_policy, ref_rl_pipe = ref_modules
    from swinwnet_tpu.compat import convert_state_dict
    from swinwnet_tpu.models import AlphaPolicy, SwinWNet
    from swinwnet_tpu.pipelines import RLInference

    torch.manual_seed(8)
    tmodel = ref_model.SwinWNet(in_chans=1, error_matrix=True, **CFG).eval()
    tpolicy = ref_policy.AlphaPolicy().eval()
    tinfer = ref_rl_pipe.SwinWNetInference(tmodel, tpolicy, "cpu")

    jmodel = SwinWNet(
        in_chans=1, error_matrix=True,
        **{**CFG, "depths": tuple(CFG["depths"]), "num_heads": tuple(CFG["num_heads"])},
    )
    jinfer = RLInference(
        jmodel,
        {"params": convert_state_dict(tmodel.state_dict())},
        AlphaPolicy(),
        {"params": convert_state_dict(tpolicy.state_dict())},
    )

    x = np.random.default_rng(8).uniform(0, 100, size=(1, 1, H, W)).astype(np.float32)
    with torch.no_grad():
        tout = tinfer(torch.from_numpy(x))
    jout = jinfer(x)

    want = tout.numpy()
    got = np.asarray(jout)
    err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
    assert err < 1e-3, f"images_masked_hr rel err {err:.2e}"


@pytest.mark.slow
def test_st_pipeline_parity_full_geometry(ref_modules):
    """VERDICT round-1 item 9: the real 250x480 -> 500x960 geometry through
    all 8 stages — exercises the actual padding/cropping path and the
    ScaleAwarePatchEmbed scale-2 branch at full size (SwinWNet.py:60-67),
    which the fast 50x60 proxy above cannot."""
    ref_model, ref_pipe, _, _ = ref_modules
    from swinwnet_tpu.compat import convert_state_dict
    from swinwnet_tpu.models import SwinWNet
    from swinwnet_tpu.pipelines import SwinWNetInference

    torch.manual_seed(11)
    tmodel = ref_model.SwinWNet(in_chans=1, error_matrix=True, **CFG).eval()
    tinfer = ref_pipe.SwinWNetInference(tmodel, "cpu")

    jmodel = SwinWNet(
        in_chans=1, error_matrix=True,
        **{**CFG, "depths": tuple(CFG["depths"]), "num_heads": tuple(CFG["num_heads"])},
    )
    jinfer = SwinWNetInference(jmodel, {"params": convert_state_dict(tmodel.state_dict())})

    x = np.random.default_rng(11).uniform(0, 1e3, size=(1, 1, 250, 480)).astype(np.float32)
    with torch.no_grad():
        tout = tinfer(torch.from_numpy(x))
    jout = jinfer(x)

    assert np.asarray(jout).shape == (1, 2, 500, 960)  # diffraction + error channel
    for name in (
        "images",
        "seg_map_lr",
        "images_masked_lr",
        "norm",
        "upscaled_norm",
        "upscaled_denorm",
        "seg_map_hr",
        "images_masked_hr",
    ):
        want = getattr(tinfer, name).numpy()
        got = np.asarray(getattr(jinfer, name))
        assert got.shape == want.shape, name
        denom = max(np.abs(want).max(), 1e-6)
        err = np.abs(got - want).max() / denom
        assert err < 1e-3, f"{name}: rel err {err:.2e}"
