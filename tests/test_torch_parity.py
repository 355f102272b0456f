"""Numerical parity vs the PyTorch reference implementation.

Loads the upstream `SwinWNet.py` module from /root/reference (read-only) as a
behavioral oracle, copies randomly initialized torch weights through the
`compat` converter, and checks activations match to fp32 tolerance. This
validates checkpoint portability: any published .pth produces the same masks
and upscaled patterns through the JAX stack.

Skipped automatically when the reference checkout is absent.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REF_MODEL = "/root/reference/SwinWNet.py"
REF_POLICY = "/root/reference/RL_policy.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_MODEL), reason="reference checkout not available"
)

torch = pytest.importorskip("torch")


def _load_ref_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    return _load_ref_module(REF_MODEL, "ref_swinwnet")


# Small-but-structured geometry: exercises window padding (25x30 tokens at
# level 0, odd sizes below) while keeping CPU runtime low.
H, W = 50, 60
CFG = dict(
    patch_size=2,
    embed_dim=48,
    depths=[2, 2, 2, 2],
    num_heads=[3, 6, 12, 24],
    window_size=5,
)


def to_jax_params(torch_model):
    from swinwnet_tpu.compat import convert_state_dict

    return {"params": convert_state_dict(torch_model.state_dict())}


def assert_close(a, b, tol=2e-4, name=""):
    a = np.asarray(a)
    b = b.detach().cpu().numpy()
    assert a.shape == b.shape, f"{name}: {a.shape} vs {b.shape}"
    denom = np.maximum(np.abs(b).max(), 1e-6)
    err = np.abs(a - b).max() / denom
    assert err < tol, f"{name}: max rel err {err:.3e}"


class TestSwinUNetParity:
    def test_forward(self, ref):
        from swinwnet_tpu.models import SwinUNet

        torch.manual_seed(0)
        tmodel = ref.SwinUNet(in_chans=1, **CFG).eval()
        jmodel = SwinUNet(in_chans=1, **{**CFG, "depths": tuple(CFG["depths"]), "num_heads": tuple(CFG["num_heads"])})

        x = np.random.default_rng(0).normal(size=(1, 1, H, W)).astype(np.float32)
        with torch.no_grad():
            want = tmodel(torch.from_numpy(x))
        got = jmodel.apply(to_jax_params(tmodel), x)
        assert_close(got, want, name="SwinUNet")


class TestSwinUNetSRParity:
    def test_forward(self, ref):
        from swinwnet_tpu.models import SwinUNetSR

        torch.manual_seed(1)
        tmodel = ref.SwinUNetSR(in_chans=1, **CFG).eval()
        jmodel = SwinUNetSR(in_chans=1, **{**CFG, "depths": tuple(CFG["depths"]), "num_heads": tuple(CFG["num_heads"])})

        x = np.random.default_rng(1).normal(size=(1, 1, H, W)).astype(np.float32)
        with torch.no_grad():
            want = tmodel(torch.from_numpy(x))
        got = jmodel.apply(to_jax_params(tmodel), x)
        assert_close(got, want, name="SwinUNetSR")


class TestSwinWNetParity:
    @pytest.fixture(scope="class")
    def models(self, ref):
        from swinwnet_tpu.models import SwinWNet

        torch.manual_seed(2)
        tmodel = ref.SwinWNet(in_chans=1, error_matrix=True, **CFG).eval()
        jmodel = SwinWNet(
            in_chans=1,
            error_matrix=True,
            **{**CFG, "depths": tuple(CFG["depths"]), "num_heads": tuple(CFG["num_heads"])},
        )
        return tmodel, jmodel, to_jax_params(tmodel)

    def test_staged_forward(self, models):
        from swinwnet_tpu.models import SwinWNet

        tmodel, jmodel, params = models
        x = np.random.default_rng(2).normal(size=(1, 2, H, W)).astype(np.float32)
        tx = torch.from_numpy(x)

        with torch.no_grad():
            tseg, tskips = tmodel.segment_1(tx)
        jseg, jskips = jmodel.apply(params, x, method=SwinWNet.segment_1)
        assert_close(jseg, tseg, name="segment_1")

        # skips: torch [B, L, C] vs jax [B, h, w, C]
        for i, (js, ts) in enumerate(zip(jskips, tskips)):
            js2 = np.asarray(js).reshape(ts.shape[0], -1, ts.shape[-1])
            assert_close(js2, ts, name=f"skip_{i}")

        with torch.no_grad():
            tup, tskips_up = tmodel.upscale(tx, tskips)
        jup, jskips_up = jmodel.apply(params, x, jskips, method=SwinWNet.upscale)
        assert_close(jup, tup, name="upscale")

        with torch.no_grad():
            tseg2, _ = tmodel.segment_2(tup, tskips_up)
        jseg2, _ = jmodel.apply(params, np.asarray(jup), jskips_up, method=SwinWNet.segment_2)
        assert_close(jseg2, tseg2, tol=5e-4, name="segment_2")


class TestAlphaPolicyParity:
    def test_forward(self):
        if not os.path.exists(REF_POLICY):
            pytest.skip("no reference policy")
        ref_policy = _load_ref_module(REF_POLICY, "ref_rl_policy")
        from swinwnet_tpu.compat import convert_state_dict
        from swinwnet_tpu.models import AlphaPolicy, apply_action

        torch.manual_seed(3)
        tp = ref_policy.AlphaPolicy().eval()
        jp = AlphaPolicy()
        params = {"params": convert_state_dict(tp.state_dict())}

        x = np.random.default_rng(3).normal(size=(2, 2, 32, 40)).astype(np.float32)
        with torch.no_grad():
            tmu, tstd = tp(torch.from_numpy(x))
        jmu, jstd = jp.apply(params, x)
        assert_close(jmu, tmu, name="mu")
        assert_close(jstd, tstd, name="std")

        sr = np.random.default_rng(4).normal(size=(2, 2, 32, 40)).astype(np.float32)
        with torch.no_grad():
            twant = ref_policy.apply_action(torch.from_numpy(sr), tmu)
        got = apply_action(sr, np.asarray(jmu))
        assert_close(got, twant, name="apply_action")


class TestConverterUtilities:
    def test_unwrap_and_sniff(self, ref):
        from swinwnet_tpu.compat import sniff_error_matrix, unwrap_state_dict

        torch.manual_seed(4)
        tmodel = ref.SwinWNet(in_chans=1, error_matrix=True, **CFG)
        sd = {"module." + k: v for k, v in tmodel.state_dict().items()}
        wrapped = {"state_dict": sd}
        out = unwrap_state_dict(wrapped)
        assert not any(k.startswith("module.") for k in out)
        assert sniff_error_matrix(out)  # in_chans = 2

        tmodel1 = ref.SwinWNet(in_chans=1, error_matrix=False, **CFG)
        assert not sniff_error_matrix(tmodel1.state_dict())

    def test_tree_structure_matches_init(self, ref):
        """Converted tree must be pytree-compatible with a fresh init."""
        import jax

        from swinwnet_tpu.models import SwinWNet

        torch.manual_seed(5)
        tmodel = ref.SwinWNet(in_chans=1, error_matrix=True, **CFG)
        converted = to_jax_params(tmodel)["params"]

        jmodel = SwinWNet(
            in_chans=1,
            error_matrix=True,
            **{**CFG, "depths": tuple(CFG["depths"]), "num_heads": tuple(CFG["num_heads"])},
        )
        x = np.zeros((1, 2, H, W), np.float32)
        init_params = jmodel.init(jax.random.PRNGKey(0), x)["params"]

        want = {"/".join(map(str, p)) for p, _ in jax.tree_util.tree_flatten_with_path(init_params)[0]}
        got = {"/".join(map(str, p)) for p, _ in jax.tree_util.tree_flatten_with_path(converted)[0]}
        assert want == got, f"missing: {sorted(want - got)[:5]} extra: {sorted(got - want)[:5]}"
