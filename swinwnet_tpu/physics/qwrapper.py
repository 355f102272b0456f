"""2D detector pattern -> 1D I(d) rebinning, TPU-native.

The reference `Qwrapper` (Diffraction_metrics.py:11-70) loops over the batch in
Python, does a `torch.bucketize` + `scatter_add_` per sample, and immediately
pulls results to the CPU. On TPU the whole thing collapses to one compiled op:

* the detector geometry is *static* — the interplanar-distance map
  ``d(lambda, theta) = lambda / (2 sin(|theta|/2))`` and therefore the bin
  index of every pixel are computed **once** in numpy at wrapper-construction
  time;
* the per-sample rebin is then a single ``jax.ops.segment_sum`` over the
  flattened image with precomputed indices (static `num_segments`), `vmap`-ed
  over the batch and `jit`-compiled. No host<->device traffic, no Python loop.

Pixels with d > d_max (7.5 A, Diffraction_metrics.py:51) and pixels that fall
outside the bin edges are routed to a dump bin that is sliced off.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import GEOMETRY

# Published evaluation d-grids (reference: tests.py:168-169, RL_finetuning_pipline.py:19)
d_centers_lr = np.linspace(0.0546658, 7.49180085, 832)
d_centers_hr = np.linspace(0.05318052, 7.49710258, 1241)


def make_d_grid(H, W, theta_range=GEOMETRY.theta_range, L_range=GEOMETRY.lambda_range):
    """Static interplanar-distance map of an HxW detector image.

    Matches Diffraction_metrics.py:43-49: theta (degrees) spans the columns,
    lambda the rows, ``d = lambda / (2 sin(|theta| / 2))``.
    """
    theta_deg = np.linspace(theta_range[0], theta_range[1], W)
    L_vals = np.linspace(L_range[0], L_range[1], H)
    theta_rad = np.deg2rad(theta_deg)
    L_grid, theta_grid = np.meshgrid(L_vals, theta_rad, indexing="ij")
    return L_grid / (2.0 * np.sin(np.abs(theta_grid) * 0.5))


def centers_to_edges(centers: np.ndarray) -> np.ndarray:
    """Bin edges from fixed centers (Diffraction_metrics.py:29-33)."""
    centers = np.asarray(centers, dtype=np.float32)
    edges = np.zeros(len(centers) + 1, dtype=np.float32)
    edges[1:-1] = (centers[:-1] + centers[1:]) * 0.5
    edges[0] = centers[0] - (centers[1] - centers[0]) * 0.5
    edges[-1] = centers[-1] + (centers[-1] - centers[-2]) * 0.5
    return edges


@functools.partial(jax.jit, static_argnames=("num_segments",))
def _batched_segment_sum(I_flat, idx, num_segments):
    # I_flat: [B, H*W] float; idx: [H*W] int32 (shared across batch)
    return jax.vmap(
        lambda row: jax.ops.segment_sum(row, idx, num_segments=num_segments)
    )(I_flat)


class Qwrapper:
    """Vectorized d-space rebinner with a fixed-center d-grid.

    API mirrors the reference class: ``tensor_to_d(batch)`` accepts a
    ``[B, 1, H, W]`` array and returns a list of ``{"d", "I"}`` numpy dicts
    (Diffraction_metrics.py:35-70). The TPU-native entry point
    ``rebin(batch)`` returns the on-device ``[B, n_bins]`` array and stays
    inside the compiled graph — use it for RL rewards and fused eval.
    """

    def __init__(
        self,
        theta_range=GEOMETRY.theta_range,
        L_range=GEOMETRY.lambda_range,
        fixed_centers=None,
        d_max: float = GEOMETRY.d_max,
    ):
        if fixed_centers is None:
            raise ValueError("fixed_centers must be provided")
        self.theta_range = theta_range
        self.L_range = L_range
        self.d_max = float(d_max)
        self.centers = np.asarray(fixed_centers, dtype=np.float32)
        self.edges = centers_to_edges(self.centers)
        self.n_bins = len(self.centers)
        self._index_cache = {}

    def _indices_for(self, H: int, W: int) -> np.ndarray:
        """Per-pixel target bin (static), masked pixels -> dump bin n_bins.

        Cached as NUMPY (never as a jax array): `rebin` may be traced inside
        jit, and caching a trace-time constant would leak a tracer into later
        traces."""
        key = (H, W)
        if key not in self._index_cache:
            d_grid = make_d_grid(H, W, self.theta_range, self.L_range)
            # torch.bucketize(v, edges) with right=False == searchsorted side='right';
            # the reference then subtracts 1 and clamps to [0, n-1]
            # (Diffraction_metrics.py:61-63).
            idx = np.searchsorted(self.edges, d_grid.ravel(), side="right") - 1
            idx = np.clip(idx, 0, self.n_bins - 1)
            masked = d_grid.ravel() > self.d_max
            idx = np.where(masked, self.n_bins, idx)  # dump bin
            self._index_cache[key] = idx.astype(np.int32)
        return self._index_cache[key]

    def rebin(self, batch) -> jnp.ndarray:
        """[B, 1, H, W] (or [B, H, W]) -> [B, n_bins] I(d); fully on-device."""
        batch = jnp.asarray(batch)
        if batch.ndim == 4:
            batch = batch[:, 0]
        B, H, W = batch.shape
        idx = self._indices_for(H, W)
        I_flat = batch.reshape(B, H * W).astype(jnp.float32)
        summed = _batched_segment_sum(I_flat, idx, self.n_bins + 1)
        return summed[:, : self.n_bins]

    def tensor_to_d(self, batch_tensor):
        """Reference-compatible API: list of per-sample {"d", "I"} numpy dicts."""
        batch_tensor = jnp.asarray(batch_tensor)
        if batch_tensor.ndim != 4:
            raise ValueError("Expected tensor [B,1,H,W]")
        I = np.asarray(self.rebin(batch_tensor))
        return [{"d": self.centers.copy(), "I": I[b]} for b in range(I.shape[0])]
