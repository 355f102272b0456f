"""REINFORCE fine-tuning of the upscaler via a physics-based reward
(reference: RL_finetuning_pipline.py:11-307).

The entire step — frozen-segmentator preprocess, policy sampling, the no-grad
reward rollout (upscale -> apply_action -> denormalize -> d-space rebin ->
peak metrics), the policy update, and the supervised model update — is ONE
jitted function. The reference crosses to the CPU for scipy peak finding every
batch (RL_finetuning_pipline.py:202-230); here the reward uses the vectorized
on-device metrics (physics/device_metrics.py), so the TPU never stalls.

Two optimizers as in the reference (Adam 1e-4 policy / 1e-5 model,
:118-125); the model update trains upscaler towers + ca_seg_to_sr
(:85-101) with a plain L1 reconstruction term scaled by lambda_rec (:244-258
— note the reference constructs a configurable upscaler loss but the step
hard-codes F.l1_loss; we keep L1 for parity).

Deviation (documented): the reference draws the action with `rsample()` and
differentiates `log_prob(alpha)` through the reparameterized sample
(:196-200), which makes the REINFORCE gradient cancel identically
(d/dmu[(alpha-mu)] = 0). We `stop_gradient` the sampled action, i.e. standard
REINFORCE, which is the evident intent.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.alpha_policy import AlphaPolicy, apply_action
from ..models.swin_wnet import SwinWNet
from ..ops.norms import ensure_2ch, normalize_piecewise, denormalize_piecewise
from ..ops.resize import bilinear_downscale_half
from ..physics.device_metrics import diffraction_metrics_device
from ..physics.qwrapper import Qwrapper, d_centers_hr
from .freeze import masked_adamw
from .trainers import TrainState, _with_compute_dtype


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RLState:
    model: TrainState
    policy: TrainState
    rng: jax.Array


def make_rl_train_step(
    model: SwinWNet,
    policy: AlphaPolicy,
    model_tx,
    policy_tx,
    qwrapper: Qwrapper,
    lambda_rec: float = 10.0,
    lambda_intensity: float = 2.0,
    lambda_peak: float = 1.0,
    lambda_shape: float = 0.5,
):
    """One compiled RL step: (RLState, images) -> (RLState, metrics dict)."""
    centers = jnp.asarray(qwrapper.centers)

    def preprocess(params, images):
        """RL_finetuning_pipline.py:183-191 (no-grad)."""
        seg, skips = model.apply({"params": params}, images, method=SwinWNet.segment_1)
        seg_images = images * jax.nn.sigmoid(seg.astype(jnp.float32))
        lr = bilinear_downscale_half(seg_images)
        norm_lr, _ = normalize_piecewise(lr)
        norm_hr, params_hr = normalize_piecewise(seg_images)
        return jax.lax.stop_gradient((seg_images, norm_lr, norm_hr, params_hr, skips))

    def reward_of(params, norm_lr, skips, alpha, params_hr, seg_images):
        """No-grad rollout + on-device physical reward (:202-230)."""
        sr_out, _ = model.apply({"params": params}, norm_lr, skips, method=SwinWNet.upscale)
        sr_out = apply_action(sr_out.astype(jnp.float32), alpha)
        denorm_pred = denormalize_piecewise(sr_out, params_hr)[:, 0:1]
        denorm_tgt = seg_images[:, 0:1]

        pred_spec = qwrapper.rebin(denorm_pred)
        true_spec = qwrapper.rebin(denorm_tgt)
        m = diffraction_metrics_device(pred_spec, true_spec, centers)
        total = (
            lambda_intensity * m["Integral Intensity"]
            + lambda_peak * m["Peak Intensity"]
            + lambda_shape * m["Shape"]
        )
        return -total, m

    @jax.jit
    def step(state: RLState, images):
        rng, key = jax.random.split(state.rng)
        images = ensure_2ch(images)
        seg_images, norm_lr, norm_hr, params_hr, skips = preprocess(state.model.params, images)

        # ---- policy update (REINFORCE) ----
        noise = jax.random.normal(key, (images.shape[0], 1))

        def policy_loss_of(policy_params):
            mu, std = policy.apply({"params": policy_params}, norm_lr)
            alpha = jax.lax.stop_gradient(mu) + std * noise  # sampled action
            log_prob = (
                -0.5 * jnp.square((alpha - mu) / std) - jnp.log(std) - 0.5 * jnp.log(2 * jnp.pi)
            ).sum(axis=1)
            reward, m = reward_of(
                state.model.params, norm_lr, skips, jax.lax.stop_gradient(alpha), params_hr, seg_images
            )
            reward = jax.lax.stop_gradient(reward)
            loss = -(log_prob * reward).mean()
            return loss, (alpha, mu, reward, m)

        (policy_loss, (alpha, mu, reward, m)), pgrads = jax.value_and_grad(
            policy_loss_of, has_aux=True
        )(state.policy.params)
        pupdates, popt = policy_tx.update(pgrads, state.policy.opt_state, state.policy.params)
        policy_params = optax.apply_updates(state.policy.params, pupdates)
        policy_state = TrainState(policy_params, popt, state.policy.step + 1)

        # ---- supervised model update (:244-258) ----
        alpha_det = jax.lax.stop_gradient(mu)

        def model_loss_of(params):
            sr_out2, _ = model.apply({"params": params}, norm_lr, skips, method=SwinWNet.upscale)
            sr_out2 = apply_action(sr_out2.astype(jnp.float32), alpha_det)
            rec = jnp.mean(jnp.abs(sr_out2 - norm_hr))  # F.l1_loss
            return lambda_rec * rec, rec

        (sup_loss, rec), mgrads = jax.value_and_grad(model_loss_of, has_aux=True)(
            state.model.params
        )
        mupdates, mopt = model_tx.update(mgrads, state.model.opt_state, state.model.params)
        model_params = optax.apply_updates(state.model.params, mupdates)
        model_state = TrainState(model_params, mopt, state.model.step + 1)

        metrics = {
            "reward": reward.mean(),
            "rec": rec,
            "integral": m["Integral Intensity"].mean(),
            "peak": m["Peak Intensity"].mean(),
            "shape": m["Shape"].mean(),
            "alpha_mean": alpha.mean(),
            "alpha_std": alpha.std(),
            "policy_loss": policy_loss,
            "sup_loss": sup_loss,
        }
        return RLState(model=model_state, policy=policy_state, rng=rng), metrics

    return step


class RLTrainer:
    """Epoch driver mirroring the reference API (RL_finetuning_pipline.py:272-307)."""

    def __init__(
        self,
        model: SwinWNet,
        params,
        policy: AlphaPolicy,
        policy_params,
        train_loader,
        d_centers=d_centers_hr,
        num_epochs: int = 100,
        lambda_rec: float = 10.0,
        lambda_intensity: float = 2.0,
        lambda_peak: float = 1.0,
        lambda_shape: float = 0.5,
        policy_lr: float = 1e-4,
        model_lr: float = 1e-5,
        compute_dtype=None,
        seed: int = 0,
        verbose: bool = True,
    ):
        self.model = model
        self.policy = policy
        self.train_loader = train_loader
        self.num_epochs = num_epochs
        self.verbose = verbose

        qw = Qwrapper(fixed_centers=np.asarray(d_centers))
        # reference optimizers: Adam 1e-4 policy / 1e-5 model (:118-125)
        self.policy_tx = optax.adam(policy_lr)
        self.model_tx = masked_adamw(params, "rl", model_lr, weight_decay=0.0)

        self.state = RLState(
            model=TrainState.create(params, self.model_tx),
            policy=TrainState.create(policy_params, self.policy_tx),
            rng=jax.random.PRNGKey(seed),
        )
        self._step = make_rl_train_step(
            _with_compute_dtype(model, compute_dtype),
            policy,
            self.model_tx,
            self.policy_tx,
            qw,
            lambda_rec,
            lambda_intensity,
            lambda_peak,
            lambda_shape,
        )
        self.history = []

    def train_epoch(self) -> Dict[str, float]:
        agg: Dict[str, float] = {}
        n = 0
        for batch in self.train_loader:
            images = batch[0] if isinstance(batch, (tuple, list)) else batch
            self.state, metrics = self._step(self.state, jnp.asarray(images))
            for k, v in metrics.items():
                agg[k] = agg.get(k, 0.0) + float(v)
            n += 1
        return {k: v / max(n, 1) for k, v in agg.items()}

    def fit(self):
        for epoch in range(self.num_epochs):
            metrics = self.train_epoch()
            self.history.append(metrics)
            if self.verbose:
                print(
                    f"Epoch [{epoch+1}/{self.num_epochs}] "
                    + " ".join(f"{k}={v:.4f}" for k, v in metrics.items())
                )
        return self.history
