"""Training subsystem behavior on a tiny model: freezing, step mechanics,
schedules, the 3-stage orchestrator, and the compiled RL step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swinwnet_tpu.data import ArrayLoader
from swinwnet_tpu.models import AlphaPolicy, SwinWNet
from swinwnet_tpu.train.freeze import masked_adamw, stage_trainable_labels
from swinwnet_tpu.train.losses import combined_loss, smooth_l1_loss
from swinwnet_tpu.train.schedule import warmup_cosine_schedule
from swinwnet_tpu.train.trainers import (
    TrainState,
    make_stage1_step,
    make_stage2_step,
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
H = W = 40


@pytest.fixture(scope="module")
def setup():
    model = SwinWNet(**TINY)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, H, W)))["params"]
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 10, (2, 1, H, W)), jnp.float32)
    masks = jnp.asarray(rng.uniform(size=(2, H, W)) > 0.5, jnp.float32)
    return model, params, images, masks


def _tree_diff(a, b):
    """Set of top-level modules whose params changed."""
    changed = set()
    for top in a:
        leaves_a = jax.tree.leaves(a[top])
        leaves_b = jax.tree.leaves(b[top])
        if any(not np.allclose(x, y) for x, y in zip(leaves_a, leaves_b)):
            changed.add(top)
    return changed


def test_labels():
    tree = {
        "patch_embed": {"k": 0},
        "segmentator_encoder": {"k": 0},
        "upscaler_head": {"k": 0},
        "ca_seg_to_sr": {"k": 0},
    }
    labels = stage_trainable_labels(tree, "stage1")
    assert labels["patch_embed"]["k"] == "train"
    assert labels["segmentator_encoder"]["k"] == "train"
    assert labels["upscaler_head"]["k"] == "freeze"
    assert labels["ca_seg_to_sr"]["k"] == "freeze"
    labels = stage_trainable_labels(tree, "rl")
    assert labels["upscaler_head"]["k"] == "train"
    assert labels["ca_seg_to_sr"]["k"] == "train"
    assert labels["patch_embed"]["k"] == "freeze"


def test_schedule():
    sched = warmup_cosine_schedule(1.0, warmup_epochs=10, num_epochs=100, steps_per_epoch=5)
    # epoch 0 -> 1/10 (torch LambdaLR lr_lambda(0))
    np.testing.assert_allclose(float(sched(0)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(sched(4)), 0.1, rtol=1e-6)  # same epoch
    np.testing.assert_allclose(float(sched(5)), 0.2, rtol=1e-6)  # epoch 1
    np.testing.assert_allclose(float(sched(10 * 5)), 1.0, rtol=1e-6)  # end of warmup
    # final epoch ~ 0
    assert float(sched(99 * 5)) < 0.01


@pytest.mark.slow
def test_stage1_freezes_upscaler(setup):
    model, params, images, masks = setup
    tx = masked_adamw(params, "stage1", 1e-3)
    state = TrainState.create(params, tx)
    step = make_stage1_step(model, tx, combined_loss)
    new_state, loss = step(state, images, masks)
    assert np.isfinite(float(loss))
    changed = _tree_diff(params, new_state.params)
    assert "patch_embed" in changed
    assert any(t.startswith("segmentator_") for t in changed)
    assert not any(t.startswith("upscaler_") for t in changed)
    assert "ca_seg_to_sr" not in changed and "ca_sr_to_seg" not in changed


@pytest.mark.slow
def test_stage2_trains_only_upscaler(setup):
    model, params, images, masks = setup
    tx = masked_adamw(params, "stage2", 1e-3)
    state = TrainState.create(params, tx)
    step = make_stage2_step(model, tx, smooth_l1_loss)
    new_state, loss = step(state, images)
    assert np.isfinite(float(loss))
    changed = _tree_diff(params, new_state.params)
    assert changed and all(t.startswith("upscaler_") for t in changed)


@pytest.mark.slow
def test_stage3_even_odd(setup):
    model, params, images, masks = setup
    tx = masked_adamw(params, "stage3", 1e-3)
    state = TrainState.create(params, tx)
    even, odd, even_eval, odd_eval = make_stage3_steps(
        model, tx, combined_loss, smooth_l1_loss
    )
    state, aux_e = even(state, images, masks)
    assert np.isfinite(float(aux_e["loss"])) and float(aux_e["rec"]) > 0
    assert float(aux_e["seg_hr"]) == 0
    state, aux_o = odd(state, images, masks)
    assert np.isfinite(float(aux_o["loss"])) and float(aux_o["seg_hr"]) > 0
    assert float(aux_o["rec"]) == 0
    aux = even_eval(state.params, images, masks)
    assert np.isfinite(float(aux["loss"]))


@pytest.mark.slow
def test_stage1_loss_decreases(setup):
    model, params, images, masks = setup
    tx = masked_adamw(params, "stage1", 1e-3)
    state = TrainState.create(params, tx)
    step = make_stage1_step(model, tx, combined_loss)
    state, first = step(state, images, masks)
    for _ in range(8):
        state, loss = step(state, images, masks)
    assert float(loss) < float(first)


@pytest.mark.slow
def test_rl_step(setup):
    import optax

    from swinwnet_tpu.physics.qwrapper import Qwrapper
    from swinwnet_tpu.train.rl import RLState, make_rl_train_step

    model, params, images, masks = setup
    policy = AlphaPolicy()
    policy_params = policy.init(jax.random.PRNGKey(1), jnp.zeros((1, 2, H // 2, W // 2)))["params"]

    centers = np.linspace(0.05, 7.49, 160)  # small grid keeps CPU compile sane
    qw = Qwrapper(fixed_centers=centers)
    model_tx = masked_adamw(params, "rl", 1e-4, weight_decay=0.0)
    policy_tx = optax.adam(1e-4)
    step = make_rl_train_step(model, policy, model_tx, policy_tx, qw)

    state = RLState(
        model=TrainState.create(params, model_tx),
        policy=TrainState.create(policy_params, policy_tx),
        rng=jax.random.PRNGKey(0),
    )
    new_state, metrics = step(state, images)
    for k in ("reward", "rec", "integral", "peak", "shape", "policy_loss", "sup_loss"):
        assert np.isfinite(float(metrics[k])), k
    # model update must leave the segmentator untouched
    changed = _tree_diff(state.model.params, new_state.model.params)
    assert not any(t.startswith("segmentator_") for t in changed)
    assert any(t.startswith("upscaler_") for t in changed)
    # the policy only receives gradient when the physics reward is nonzero
    # (REINFORCE: grad = -E[reward * noise/std * dmu/dtheta]); with a random
    # init the spectra may contain no matched peaks -> reward exactly 0.
    p_changed = _tree_diff(
        {"p": state.policy.params}, {"p": new_state.policy.params}
    )
    if float(metrics["reward"]) != 0.0:
        assert p_changed
    # policy optimizer state advanced regardless
    assert int(new_state.policy.step) == 1


@pytest.mark.slow
def test_trainer_save_resume(setup, tmp_path):
    from swinwnet_tpu.train.trainers import SegmentatorTrainer

    model, params, images, masks = setup
    loader = [(np.asarray(images), np.asarray(masks))]
    t = SegmentatorTrainer(model, params, loader, num_epochs=1, warmup_epochs=1, verbose=False)
    t.state, _ = t._step(t.state, images, masks)
    path = t.save(str(tmp_path))
    assert "step_" in path

    t2 = SegmentatorTrainer(model, params, loader, num_epochs=1, warmup_epochs=1, verbose=False)
    assert t2.resume(str(tmp_path))
    assert int(t2.state.step) == int(t.state.step)
    a = jax.tree.leaves(t.state.params)[0]
    b = jax.tree.leaves(t2.state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert not t2.resume(str(tmp_path / "empty"))


@pytest.mark.slow
def test_native_batcher_drop_in(setup):
    """The C++ NativeBatcher feeds SegmentatorTrainer exactly like
    ArrayLoader: one epoch of [B,1,H,W]/[B,H,W] float32 batches."""
    from swinwnet_tpu.data.native_loader import NativeBatcher
    from swinwnet_tpu.train.trainers import SegmentatorTrainer

    if not NativeBatcher.available():
        pytest.skip("no C++ toolchain for the native batcher")
    model, params, images, masks = setup
    loader = NativeBatcher(
        np.asarray(images), np.asarray(masks), batch_size=2, shuffle=True,
        add_noise=True, seed=5,
    )
    t = SegmentatorTrainer(model, params, loader, num_epochs=2,
                           warmup_epochs=1, verbose=False)
    hist = t.train()
    loader.close()
    assert len(hist["train_loss"]) == 2
    assert all(np.isfinite(v) for v in hist["train_loss"])
    assert _tree_diff(params, t.state.params)


def test_keep_best_restores_best_val_params(setup):
    """Best-val model selection: after train(), state.params are the params
    of the lowest-val epoch, not the last epoch's (QUALITY_r05 stage-3
    overfit monotonically — the eval saw worst-val params)."""
    from swinwnet_tpu.train.trainers import SegmentatorTrainer

    model, params, images, masks = setup
    loader = [(np.asarray(images), np.asarray(masks))]
    t = SegmentatorTrainer(
        model, params, loader, val_loader=loader, num_epochs=1,
        warmup_epochs=1, verbose=False, keep_best=True,
    )
    def snap(tree):
        return [np.asarray(x).copy() for x in jax.tree.leaves(tree)]

    # drive the mechanism directly with synthetic val losses
    t._track_best(1.0)                      # epoch-0 params are the best
    best = snap(t.state.params)
    t.state, _ = t._step(t.state, images, masks)   # params move on
    t.history_val.append(1.0)
    t._track_best(2.0)                      # worse val: not recorded
    moved = snap(t.state.params)
    assert any(not np.allclose(a, b) for a, b in zip(best, moved))
    t._restore_best()
    restored = snap(t.state.params)
    for a, b in zip(restored, best):
        np.testing.assert_allclose(a, b)
    assert t.best_epoch == 0

    # NaN and disabled paths are no-ops
    t2 = SegmentatorTrainer(
        model, params, loader, num_epochs=1, warmup_epochs=1, verbose=False,
    )
    t2._track_best(float("nan"))
    assert t2._best_params is None
    t2._restore_best()  # must not raise with nothing recorded


def test_keep_best_end_to_end(setup):
    """train() with keep_best + a val loader records a best epoch and returns
    finite histories."""
    from swinwnet_tpu.train.trainers import SegmentatorTrainer

    model, params, images, masks = setup
    loader = [(np.asarray(images), np.asarray(masks))]
    t = SegmentatorTrainer(
        model, params, loader, val_loader=loader, num_epochs=2,
        warmup_epochs=1, verbose=False, keep_best=True,
    )
    hist = t.train()
    assert len(hist["val_loss"]) == 2
    assert t.best_epoch in (0, 1)
    assert all(np.isfinite(v) for v in hist["val_loss"])
