"""Peak detection on 1D I(d) spectra — TPU-native vectorized variant.

``find_peaks_device`` is a fully vectorized JAX re-design of scipy's
``find_peaks`` returning a fixed-size padded peak table, suitable for compiled
RL-reward graphs where host callbacks would serialize the step. It reproduces
scipy's local-max / plateau, height, prominence, width and distance gating
(verified against scipy in tests/test_physics.py).

The host-side spec transcription (``find_peaks_for_batch`` etc., used by the
eval harness where exact scipy parity matters) lives in
:mod:`.host_oracle` and is re-exported here for API compatibility.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .host_oracle import extract_peak_region, find_peaks_for_batch  # noqa: F401

MAX_PEAKS = 64  # static peak-table capacity for the on-device variant


# ---------------------------------------------------------------------------
# On-device vectorized peak finding
# ---------------------------------------------------------------------------


def _local_maxima_mask(I):
    """scipy `_local_maxima_1d` semantics: for plateaus the *left-most middle*
    sample is reported; strict increase before, strict decrease after."""
    n = I.shape[0]
    idx = jnp.arange(n)

    # For each i, find the extent of the plateau of equal values around it.
    # scipy scans left to right: a candidate starts where I[i-1] < I[i]; the
    # plateau ends at the first j > i with I[j] != I[i]; it is a maximum iff
    # I[j] < I[i]. The reported index is (i + j - 1) // 2.
    rises = jnp.concatenate([jnp.array([False]), I[1:] > I[:-1]])  # I[i-1] < I[i]
    # next index with a different value, scanning right:
    diff_right = jnp.concatenate([I[1:] != I[:-1], jnp.array([True])])  # I[i] != I[i+1]

    # plateau end j(i): smallest j >= i+1 with I[j] != I[i]. Compute via a
    # reverse cummax over positions where value changes.
    change_pos = jnp.where(diff_right, idx + 1, n)  # position after i where value changes
    # j(i) = min over k >= i of change_pos restricted to the plateau; since a
    # plateau has constant value, j(i) = change_pos at the plateau's last index.
    # reverse cummin of change_pos works because change_pos == n inside plateau
    # until its last element.
    j = jax.lax.associative_scan(jnp.minimum, change_pos[::-1])[::-1]

    falls = jnp.where(j < n, I[jnp.clip(j, 0, n - 1)] < I, False)  # plateau followed by a drop
    is_candidate = rises & falls
    mid = (idx + j - 1) // 2

    mask = jnp.zeros(n, dtype=bool)
    mask = mask.at[jnp.where(is_candidate, mid, n)].set(True, mode="drop")
    # never report edges (scipy excludes i=0 and i=n-1 by construction)
    mask = mask.at[0].set(False).at[-1].set(False)
    return mask


def _prominences(I, peak_mask):
    """scipy `peak_prominences` with default (full) window, vectorized.

    For each sample i: left base = min over (lo, i] where lo is the last index
    left of i with I > I[i] (or 0); prominence = I[i] - max(left_min, right_min).
    """
    n = I.shape[0]
    idx = jnp.arange(n)

    def one_side(I_):
        # For every i, running from left: the minimum of I over the interval
        # (last index j < i with I[j] > I[i], i]. Computed with an O(n^2)
        # mask-free formulation is too big for n~1241 (1.5M elems is fine
        # actually: 1241^2 ~ 1.5M floats = 6 MB). Use the quadratic form for
        # clarity and let XLA fuse it; spectra are short.
        gt = I_[None, :] > I_[:, None]  # gt[i, j] = I[j] > I[i]
        jj = idx[None, :]
        left_of = jj < idx[:, None]
        barrier = jnp.where(gt & left_of, jj, -1).max(axis=1)  # last j<i with I[j]>I[i]
        in_win = (jj > barrier[:, None]) & (jj <= idx[:, None])
        return jnp.where(in_win, I_[None, :], jnp.inf).min(axis=1)

    left_min = one_side(I)
    right_min = one_side(I[::-1])[::-1]
    prom = I - jnp.maximum(left_min, right_min)
    return jnp.where(peak_mask, prom, 0.0)


def _widths(I, peak_mask, prom, rel_height=0.5):
    """scipy `peak_widths` at rel_height=0.5 of prominence, vectorized."""
    n = I.shape[0]
    idx = jnp.arange(n)
    height_eval = I - prom * rel_height

    # left intersection: largest j <= i with I[j] < height; interpolate
    below = I[None, :] < height_eval[:, None]
    jj = idx[None, :]
    left_cand = jnp.where(below & (jj < idx[:, None]), jj, -1).max(axis=1)
    right_cand = jnp.where(below & (jj > idx[:, None]), jj, n).min(axis=1)

    def interp_left(i, j, h):
        j_safe = jnp.clip(j, 0, n - 1)
        # crossing between j and j+1
        frac = jnp.where(
            j >= 0, (h - I[j_safe]) / (I[jnp.clip(j_safe + 1, 0, n - 1)] - I[j_safe] + 1e-30), 0.0
        )
        return jnp.where(j >= 0, j_safe + frac, 0.0)

    def interp_right(i, j, h):
        j_safe = jnp.clip(j, 0, n - 1)
        frac = jnp.where(
            j < n, (h - I[j_safe]) / (I[jnp.clip(j_safe - 1, 0, n - 1)] - I[j_safe] + 1e-30), 0.0
        )
        return jnp.where(j < n, j_safe - frac, float(n - 1))

    lips = interp_left(idx, left_cand, height_eval)
    rips = interp_right(idx, right_cand, height_eval)
    widths = rips - lips
    return jnp.where(peak_mask, widths, 0.0)


def _enforce_distance(peak_mask, I, distance):
    """scipy `_select_by_peak_distance`: highest peaks claim the window first.

    Tie-break on equal heights: scipy iterates its ascending argsort from the
    END, so with numpy's default unstable quicksort the survivor among exact
    equal-height peaks is an artifact of partition order — irreproducible in
    general (rebinned Poisson counts DO collide exactly; see
    tests/test_physics_device.py). Here ties are broken deterministically:
    the LATER position wins, which matches scipy whenever its sort happens to
    be stable (small/structured tie groups)."""
    n = I.shape[0]
    priority = jnp.where(peak_mask, I, -jnp.inf)
    idx = jnp.arange(n)
    # primary: descending height; secondary: descending position
    order = jnp.lexsort((-idx, -priority))

    def body(keep, k):
        pos = order[k]
        valid = peak_mask[pos]
        # peak survives iff no already-kept peak within `distance`
        near = (jnp.abs(idx - pos) < distance) & keep
        survives = valid & ~near.any()
        keep = keep | (jnp.zeros(n, bool).at[pos].set(survives))
        return keep, None

    keep, _ = jax.lax.scan(body, jnp.zeros(n, bool), jnp.arange(n))
    return keep


@functools.partial(jax.jit, static_argnames=("height", "distance", "prominence", "width", "max_peaks"))
def find_peaks_device(I, height=0.05, distance=10, prominence=0.1, width=5, max_peaks=MAX_PEAKS):
    """Vectorized scipy.find_peaks equivalent for a single spectrum.

    Returns a dict of fixed-size padded arrays:
      valid [max_peaks] bool, idx [max_peaks] int32, widths [max_peaks] float.
    """
    I = jnp.asarray(I, jnp.float32)
    # scipy.signal.find_peaks applies gates in order:
    # height -> distance -> prominence -> width.
    mask = _local_maxima_mask(I)
    mask = mask & (I >= height)
    mask = _enforce_distance(mask, I, distance)
    prom = _prominences(I, mask)
    mask = mask & (prom >= prominence)
    w = _widths(I, mask, prom)
    mask = mask & (w >= width)

    # compact to a fixed-size table (stable order by index)
    n = I.shape[0]
    idx = jnp.arange(n)
    key = jnp.where(mask, idx, n)
    order = jnp.argsort(key)[:max_peaks]
    valid = mask[order]
    return {
        "valid": valid,
        "idx": jnp.where(valid, order, 0).astype(jnp.int32),
        "widths": jnp.where(valid, w[order], 0.0),
        "heights": jnp.where(valid, I[order], 0.0),
        "prominences": jnp.where(valid, prom[order], 0.0),
    }


def find_peaks_device_batch(I_batch, **kw):
    """vmap of ``find_peaks_device`` over [B, n] spectra."""
    return jax.vmap(lambda s: find_peaks_device(s, **kw))(jnp.asarray(I_batch))
