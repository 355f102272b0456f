"""Mixed-precision training (the reference-AMP analog) + the notebook
normalization convention.

The reference trains every stage under torch.cuda.amp autocast + GradScaler
(Segmentator_pretrain.py:5,65,184-190). The TPU analog is
`compute_dtype=jnp.bfloat16`: bf16 compute, fp32 params/optimizer/losses.
These tests pin (a) params stay fp32 and never see a bf16 update, (b) the
bf16 loss trajectory tracks fp32 closely over several steps, (c) the trainer
classes accept the knob end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swinwnet_tpu.models import SwinWNet
from swinwnet_tpu.train.freeze import masked_adamw
from swinwnet_tpu.train.losses import combined_loss, smooth_l1_loss
from swinwnet_tpu.train.trainers import (
    TrainState,
    _with_compute_dtype,
    make_stage1_step,
    make_stage3_steps,
)

TINY = dict(
    in_chans=1,
    error_matrix=True,
    embed_dim=12,
    depths=(1, 1, 1, 1),
    num_heads=(3, 6, 12, 24),
    window_size=5,
)


def _data(B=2, H=50, W=60, seed=0):
    rng = np.random.default_rng(seed)
    images = jnp.asarray(rng.uniform(0, 1e3, (B, 1, H, W)), jnp.float32)
    masks = jnp.asarray((rng.uniform(size=(B, H, W)) > 0.85), jnp.float32)
    return images, masks


def test_with_compute_dtype_clone():
    model = SwinWNet(**TINY)
    assert _with_compute_dtype(model, None) is model
    assert _with_compute_dtype(model, jnp.float32) is model
    clone = _with_compute_dtype(model, jnp.bfloat16)
    assert clone.dtype == jnp.bfloat16 and model.dtype == jnp.float32
    assert clone.embed_dim == model.embed_dim


@pytest.mark.slow
def test_stage1_bf16_step_params_stay_fp32_and_loss_tracks_fp32():
    model = SwinWNet(**TINY)
    images, masks = _data()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 50, 60)))["params"]

    losses = {}
    for label, dtype in (("fp32", None), ("bf16", jnp.bfloat16)):
        tx = masked_adamw(params, "stage1", 1e-3)
        step = make_stage1_step(_with_compute_dtype(model, dtype), tx, combined_loss)
        state = TrainState.create(params, tx)
        traj = []
        for _ in range(4):
            state, loss = step(state, images, masks)
            traj.append(float(loss))
        losses[label] = traj
        assert all(
            leaf.dtype == jnp.float32 for leaf in jax.tree.leaves(state.params)
        ), f"{label}: params must stay fp32"
        assert np.all(np.isfinite(traj))

    # bf16 compute follows the fp32 trajectory closely (loose band: bf16 has
    # ~3 decimal digits; what matters is same descent, no divergence)
    np.testing.assert_allclose(losses["bf16"], losses["fp32"], rtol=2e-2)
    assert losses["bf16"][-1] < losses["bf16"][0]


@pytest.mark.slow
def test_stage3_odd_bf16_step_runs_and_is_finite():
    model = SwinWNet(**TINY)
    images, masks = _data()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 50, 60)))["params"]
    tx = masked_adamw(params, "stage3", 1e-3)
    _, odd_step, _, _ = make_stage3_steps(
        _with_compute_dtype(model, jnp.bfloat16), tx, combined_loss, smooth_l1_loss
    )
    state = TrainState.create(params, tx)
    state, aux = odd_step(state, images, masks)
    for k in ("loss", "seg_lr", "seg_hr"):
        assert np.isfinite(float(aux[k])), k
    assert all(leaf.dtype == jnp.float32 for leaf in jax.tree.leaves(state.params))


@pytest.mark.slow
def test_trainer_class_accepts_compute_dtype():
    from swinwnet_tpu.data import ArrayLoader
    from swinwnet_tpu.train import SegmentatorTrainer

    model = SwinWNet(**TINY)
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1e3, (4, 50, 60)).astype(np.float32)
    masks = (rng.uniform(size=(4, 50, 60)) > 0.85).astype(np.float32)
    loader = ArrayLoader(images, masks, batch_size=2)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 50, 60)))["params"]
    t = SegmentatorTrainer(
        model, params, loader, num_epochs=1, warmup_epochs=0,
        compute_dtype=jnp.bfloat16, verbose=False,
    )
    hist = t.train()
    assert np.isfinite(hist["train_loss"][0])


@pytest.mark.slow
def test_rl_step_accepts_compute_dtype():
    from swinwnet_tpu.data import ArrayLoader
    from swinwnet_tpu.models.alpha_policy import AlphaPolicy
    from swinwnet_tpu.train.rl import RLTrainer

    model = SwinWNet(**TINY)
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1e3, (2, 50, 60)).astype(np.float32)
    loader = ArrayLoader(images, batch_size=2)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 50, 60)))["params"]
    policy = AlphaPolicy()
    pparams = policy.init(jax.random.PRNGKey(1), jnp.zeros((1, 2, 25, 30)))["params"]
    trainer = RLTrainer(
        model, params, policy, pparams, loader,
        num_epochs=1, compute_dtype=jnp.bfloat16, verbose=False,
    )
    metrics = trainer.train_epoch()
    assert np.isfinite(metrics["reward"])


# ---------------------------------------------------------------------------
# Notebook normalization convention (the published physical-metrics protocol)
# ---------------------------------------------------------------------------


def test_notebook_norm_convention_and_intentional_noninverse():
    from swinwnet_tpu.ops.norms import (
        denormalize_piecewise,
        denormalize_piecewise_notebook,
        normalize_piecewise,
        normalize_piecewise_notebook,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 4e3, (2, 1, 16, 16)), jnp.float32)

    # the reference pair is an exact inverse
    n, p = normalize_piecewise(x)
    np.testing.assert_allclose(np.asarray(denormalize_piecewise(n, p)), np.asarray(x), rtol=2e-5)
    assert float(n.max()) <= np.log1p(1.0) + 1e-6  # strong range tops at 0.693

    # the notebook norm maps the max to exactly 1.0 ...
    nb, pb = normalize_piecewise_notebook(x)
    np.testing.assert_allclose(float(nb.max()), 1.0, rtol=1e-5)
    # ... and its denorm partner is intentionally NOT the inverse: the max
    # pixel comes back inflated by expm1(1)/1 = e - 1 ~ 1.718x of the range
    back = np.asarray(denormalize_piecewise_notebook(nb, pb))
    xmax = float(np.asarray(x).max(axis=(2, 3), keepdims=True).max())
    assert float(back.max()) > 1.5 * xmax
    np.testing.assert_allclose(float(back.max()) / xmax, np.expm1(1.0), rtol=0.05)
