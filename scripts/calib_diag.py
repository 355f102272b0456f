"""Per-crystal diagnostic: WHY do the classical degradation metrics differ
between the real reference patterns and their calibrated synthetic twins?

For each held-out crystal this renders the synthetic twin at the real
pattern's operating point (stats=5e8) and compares, side by side, the
statistics that drive the maxpool/bilinear degradation metrics:

* in-mask roughness (relative local std vs 3x3 mean) — speckle realism;
* maxpool2 inflation of the masked integral (the avgpool baseline's error
  source: max of 2x2 >> mean for rough textures);
* mask area fraction;
* per-peak count + median width on the LR 832-bin d-grid;
* the actual bilinear/avgpool Integral Intensity error of the sample.

CPU-only (host scipy + small jax ops).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import jax

jax.config.update("jax_platforms", "cpu")


def roughness(img, mask):
    """relative local std vs 3x3 mean inside the mask (calibration.py's
    measured real range: 0.28-1.13)."""
    from scipy.ndimage import uniform_filter

    m = uniform_filter(img, 3)
    s = np.sqrt(np.maximum(uniform_filter(img**2, 3) - m**2, 0.0))
    sel = (mask > 0) & (m > 50)
    return float(np.median(s[sel] / np.maximum(m[sel], 1e-9))) if sel.any() else 0.0


def maxpool2(x):
    H, W = x.shape
    return x.reshape(H // 2, 2, W // 2, 2).max(axis=(1, 3))


def integral_error(hr, mask, calc, norm_fn, denorm_fn, mode):
    import jax.numpy as jnp

    from swinwnet_tpu.ops.norms import ensure_2ch

    x = ensure_2ch(jnp.asarray((hr * mask)[None, None].astype(np.float32)))
    x = np.asarray(x)
    lr = x.reshape(1, 2, x.shape[2] // 2, 2, x.shape[3] // 2, 2).max(axis=(3, 5))
    if mode == "bilinear":
        norm_lr, _ = norm_fn(jnp.asarray(lr))
        _, params_hr = norm_fn(jnp.asarray(x))
        sr = jax.image.resize(norm_lr, x.shape, method="bilinear")
        pred = np.asarray(denorm_fn(sr, params_hr))[:, 0:1]
    else:
        pred = x[:, 0:1]
    m = calc(pred, lr[:, 0:1], peak_params_pred={"scale": True},
             peak_params_true={"scale": False}, tol=0.05)
    return {k: float(np.asarray(m[k])[0]) for k in ("Integral Intensity", "Peak Intensity", "Shape")}


def peak_table(img, mask):
    from swinwnet_tpu.physics.host_oracle import GATES, find_peaks_for_batch
    from swinwnet_tpu.physics.qwrapper import Qwrapper, d_centers_lr

    qw = Qwrapper(fixed_centers=np.asarray(d_centers_lr))
    work = (img - float(np.median(img))) * mask
    spec = qw.tensor_to_d(work[None, None].astype(np.float32))
    peaks = find_peaks_for_batch(spec, **GATES)[0]
    widths = [p.get("width", np.nan) for p in peaks]
    return len(peaks), float(np.nanmedian(widths)) if peaks else np.nan


def main():
    from swinwnet_tpu.data.calibration import real_crystal_library, render_calibrated
    from swinwnet_tpu.data.noise import add_eval_noise
    from swinwnet_tpu.data.real import load_real_eval_set
    from swinwnet_tpu.ops.norms import (
        denormalize_piecewise_notebook,
        normalize_piecewise_notebook,
    )
    from swinwnet_tpu.physics import DiffractionMetricsCalculator, d_centers_hr, d_centers_lr

    calc = DiffractionMetricsCalculator(
        fixed_centers_pred=d_centers_hr, fixed_centers_true=d_centers_lr
    )
    images, masks, names = load_real_eval_set()
    lib = real_crystal_library()

    rows = []
    for img, mask, name in zip(images, masks, names):
        spec = lib[name]
        # one eval-noise pass on the real pattern, as the classical run does
        hr_real = add_eval_noise(img[None, None].astype(np.float32), seed=0)[0, 0]
        pulse = float(spec.get("pulse_duration_us", 30.0))
        res = float(spec.get("resolution", 0.0145))
        syn = render_calibrated(
            spec["d"], spec["intensity"], stats=5e8, pulse_duration_us=pulse,
            amp_max=spec["amp_max"], H=img.shape[0], W=img.shape[1], seed=11,
            resolution=res,
        )
        hr_syn = add_eval_noise(syn[None, None].astype(np.float32), seed=0)[0, 0]
        # synthetic gt mask, same recipe as quality_run
        from swinwnet_tpu.data.calibration import pulse_width_for_duration
        from swinwnet_tpu.data.generation import synthesize_pattern

        clean = synthesize_pattern(
            spec["d"], spec["intensity"], H=img.shape[0], W=img.shape[1],
            seed=None, background=0.0,
            pulse_width=pulse_width_for_duration(pulse), resolution=res,
        )
        mask_syn = (clean > float(clean.max()) * 5e-3).astype(np.float32)

        for tag, hr, mk in (("real", hr_real, mask.astype(np.float32)),
                            ("syn ", hr_syn, mask_syn)):
            work = hr * mk
            pooled = maxpool2(work)
            infl = float(pooled.sum() * 4 / max(work.sum(), 1e-9))
            npk, wmed = peak_table(hr, mk)
            bi = integral_error(hr, mk, calc, normalize_piecewise_notebook,
                                denormalize_piecewise_notebook, "bilinear")
            av = integral_error(hr, mk, calc, normalize_piecewise_notebook,
                                denormalize_piecewise_notebook, "avgpool")
            rows.append({
                "crystal": name, "kind": tag.strip(),
                "rough": round(roughness(hr, mk), 3),
                "mask_frac": round(float(mk.mean()), 4),
                "pool_inflation": round(infl, 3),
                "n_peaks": npk, "peak_width_med": wmed,
                "bilinear_II": round(bi["Integral Intensity"], 3),
                "bilinear_PI": round(bi["Peak Intensity"], 3),
                "bilinear_SH": round(bi["Shape"], 4),
                "avgpool_II": round(av["Integral Intensity"], 3),
                "avgpool_PI": round(av["Peak Intensity"], 3),
            })
            r = rows[-1]
            print(f"{name:16s} {tag} rough={r['rough']:.2f} maskfrac={r['mask_frac']:.3f} "
                  f"pool_infl={r['pool_inflation']:.2f} npk={npk} w={wmed} "
                  f"bi_II={r['bilinear_II']:.2f} bi_PI={r['bilinear_PI']:.3f} "
                  f"av_II={r['avgpool_II']:.2f} av_PI={r['avgpool_PI']:.2f}", flush=True)

    with open("runs/calib_diag.json", "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote runs/calib_diag.json")


if __name__ == "__main__":
    main()
