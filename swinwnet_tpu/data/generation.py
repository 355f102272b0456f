"""Dataset generation (reference L0: support_files/
Diffraction_generation_script.py + Diffraction_render_script.py).

The reference drives the external McStas 3.3 Monte-Carlo simulator through
mcstasscript to render time-of-flight powder patterns of a banana detector
(480 theta bins x 250 lambda bins) from `.laz` reflection lists, sweeping
38 crystals x 6 statistics x 20 pulse durations (Diffraction_render_script.py:8-16).

Two paths here:
* `McStasRenderer` — the same instrument recipe behind a gated mcstasscript
  import (the simulator is an external binary and is not part of this image);
* `synthesize_pattern` — a fast, self-contained **synthetic Bragg renderer**:
  given a set of interplanar distances d_i with intensities, each reflection
  paints its Bragg locus lambda = 2 d_i sin(|theta|/2) across the detector
  with instrument-like wavelength broadening + Poisson counting noise. It
  produces physically-plausible patterns (peaks land on the correct d-space
  positions under `physics.Qwrapper`) for tests, benchmarks and pretraining
  without McStas.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from ..core.config import GEOMETRY

# Sweep grid of the published dataset (Diffraction_render_script.py:8-16)
SWEEP_STATS = (1e7, 5e7, 1e8, 2e8, 3e8, 5e8)
SWEEP_PULSE_DURATIONS_US = tuple(np.linspace(10, 300, 20))


def synthesize_pattern(
    d_list: Sequence[float],
    intensities: Optional[Sequence[float]] = None,
    H: int = GEOMETRY.height,
    W: int = GEOMETRY.width,
    theta_range: Tuple[float, float] = GEOMETRY.theta_range,
    lambda_range: Tuple[float, float] = GEOMETRY.lambda_range,
    pulse_width: float = 0.04,
    background: float = 2.0,
    counts_scale: float = 1000.0,
    seed: Optional[int] = 0,
) -> np.ndarray:
    """Render a [H, W] float32 synthetic diffraction pattern.

    Each d in `d_list` contributes intensity along lambda = 2 d sin(|theta|/2)
    with a Gaussian wavelength profile of width `pulse_width` (Angstrom),
    mimicking moderator pulse broadening; Poisson noise is applied on top of a
    flat background when `seed` is not None.
    """
    d_list = np.asarray(d_list, dtype=np.float64)
    if intensities is None:
        intensities = np.ones_like(d_list)
    intensities = np.asarray(intensities, dtype=np.float64)

    theta = np.deg2rad(np.abs(np.linspace(theta_range[0], theta_range[1], W)))
    lam = np.linspace(lambda_range[0], lambda_range[1], H)
    lam_grid = lam[:, None]  # [H, 1]
    sin_half = np.sin(theta * 0.5)[None, :]  # [1, W]

    img = np.zeros((H, W), dtype=np.float64)
    for d, inten in zip(d_list, intensities):
        lam_bragg = 2.0 * d * sin_half  # [1, W] per-column Bragg wavelength
        in_band = (lam_bragg > lambda_range[0]) & (lam_bragg < lambda_range[1])
        profile = np.exp(-0.5 * ((lam_grid - lam_bragg) / pulse_width) ** 2)
        # Lorentz-like 1/sin(theta) geometric factor, clipped near theta=0
        geom = 1.0 / np.maximum(sin_half, 0.05)
        img += inten * profile * geom * in_band

    img = img * counts_scale + background
    if seed is not None:
        rng = np.random.default_rng(seed)
        img = rng.poisson(np.maximum(img, 0)).astype(np.float64)
    return img.astype(np.float32)


def synthesize_dataset(
    n_samples: int,
    n_peaks_range: Tuple[int, int] = (5, 15),
    d_range: Tuple[float, float] = (0.6, 7.0),
    seed: int = 0,
    **kwargs,
):
    """[N, H, W] patterns + [N, H, W] uint8 ground-truth peak masks (pixels
    within 2 sigma of any Bragg locus)."""
    rng = np.random.default_rng(seed)
    H = kwargs.get("H", GEOMETRY.height)
    W = kwargs.get("W", GEOMETRY.width)
    images, masks = [], []
    for i in range(n_samples):
        n_peaks = int(rng.integers(*n_peaks_range))
        d_list = rng.uniform(*d_range, size=n_peaks)
        inten = rng.uniform(0.2, 3.0, size=n_peaks)
        img = synthesize_pattern(d_list, inten, seed=seed + 1000 + i, **kwargs)
        clean = synthesize_pattern(d_list, inten, seed=None, background=0.0, **kwargs)
        thr = float(clean.max()) * 5e-3 if clean.max() > 0 else 1.0
        masks.append((clean > thr).astype(np.uint8))
        images.append(img)
    return np.stack(images), np.stack(masks)


class McStasRenderer:
    """McStas TOF-diffractometer renderer (reference:
    Diffraction_generation_script.py:18-264 — 3-component moderator source,
    double disk choppers, 5.5 m guide + bender, PowderN sample from .laz
    reflection lists, 480x250 banana monitor).

    The instrument itself is a declarative spec (`data.mcstas.dif60_spec`) so
    construction is unit-testable without a simulator; this class binds it to
    a mcstasscript-compatible backend. Pass `backend=` explicitly for tests;
    by default the real `mcstasscript` package is imported (which requires a
    McStas 3.x install to actually run). The sweep driver (`render_sweep`)
    mirrors Diffraction_render_script.py:31-46 and returns records
    {Matrix, Crystal, Stats, "Pulce duration"} (sic — the published pickle's
    column spelling)."""

    def __init__(self, mcrun_path: str = "", mcstas_path: str = "", backend=None):
        if backend is None:
            try:
                import mcstasscript as backend  # noqa: F811
            except ImportError as e:
                raise ImportError(
                    "McStas rendering requires the external McStas 3.x simulator and "
                    "the mcstasscript package; use data.generation.synthesize_pattern "
                    "for a self-contained synthetic generator."
                ) from e
        self.backend = backend
        self.mcrun_path = mcrun_path
        self.mcstas_path = mcstas_path

    def get_diffraction(self, crystal: str, stats: float, pulse_duration: float) -> np.ndarray:
        from .mcstas import dif60_spec, run_instrument

        spec = dif60_spec(crystal, pulse_duration)
        return run_instrument(
            spec, self.backend, ncount=stats,
            mcrun_path=self.mcrun_path, mcstas_path=self.mcstas_path,
        )

    def render_sweep(self, crystals: Sequence[str], stats=SWEEP_STATS, pulses=SWEEP_PULSE_DURATIONS_US):
        records = []
        for crystal in crystals:
            for s in stats:
                for p in pulses:
                    records.append(
                        {
                            "Matrix": self.get_diffraction(crystal, s, p),
                            "Crystal": crystal,
                            "Stats": s,
                            "Pulce duration": p,
                        }
                    )
        return records
