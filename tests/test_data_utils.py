"""Data loaders, noise protocol, checkpoint roundtrip, ops unit tests."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swinwnet_tpu.data import ArrayLoader, add_eval_noise
from swinwnet_tpu.ops import (
    bilinear_downscale_half,
    bilinear_resize,
    compute_mask,
    denormalize_piecewise,
    ensure_2ch,
    nearest_exact_resize,
    normalize_piecewise,
    window_partition,
    window_reverse,
)


class TestLoader:
    def test_batching(self):
        images = np.arange(10 * 4 * 6, dtype=np.float32).reshape(10, 4, 6)
        masks = np.zeros((10, 4, 6), np.float32)
        loader = ArrayLoader(images, masks, batch_size=4)
        assert len(loader) == 3
        batches = list(loader)
        assert batches[0][0].shape == (4, 1, 4, 6)
        assert batches[2][0].shape == (2, 1, 4, 6)
        assert loader.n_samples == 10

    def test_shuffle_reproducible(self):
        images = np.arange(8, dtype=np.float32).reshape(8, 1, 1)
        l1 = ArrayLoader(images, batch_size=8, shuffle=True, seed=3)
        l2 = ArrayLoader(images, batch_size=8, shuffle=True, seed=3)
        b1 = next(iter(l1))[0]
        b2 = next(iter(l2))[0]
        np.testing.assert_array_equal(b1, b2)

    def test_noise(self):
        x = np.zeros((2, 1, 8, 8), np.float32)
        noised = add_eval_noise(x, mu=100, sigma=20, seed=0)
        assert 80 < noised.mean() < 120

    def test_augment_hook(self):
        from swinwnet_tpu.data.noise import make_train_noise_augment

        images = np.zeros((8, 1, 4, 6), np.float32)
        aug = make_train_noise_augment(mu_range=(100.0, 100.0))
        l1 = ArrayLoader(images, batch_size=4, augment=aug, seed=7)
        l2 = ArrayLoader(images, batch_size=4, augment=aug, seed=7)
        (a1, _), (b1, _) = list(l1)[0], list(l2)[0]
        np.testing.assert_array_equal(a1, b1)  # same seed/epoch -> same noise
        assert 80 < a1.mean() < 120
        # masks are untouched and a later batch draws different noise
        batches = list(ArrayLoader(images, images[:, 0], batch_size=4, augment=aug))
        assert not np.allclose(batches[0][0], batches[1][0])
        np.testing.assert_array_equal(batches[0][1], np.zeros((4, 4, 6)))


class TestOps:
    def test_window_roundtrip(self):
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 13, 17, 4)), jnp.float32)
        w, (Hp, Wp) = window_partition(x, 5)
        assert w.shape == (2 * 3 * 4, 25, 4)
        back = window_reverse(w, 5, Hp, Wp)
        np.testing.assert_allclose(np.asarray(back[:, :13, :17]), np.asarray(x), rtol=1e-6)

    def test_window_roundtrip_nmajor(self):
        from swinwnet_tpu.ops.window import window_partition_nmajor, window_reverse_nmajor

        x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 13, 17, 4)), jnp.float32)
        w, (Hp, Wp) = window_partition_nmajor(x, 5)
        assert w.shape == (25, 2 * 3 * 4, 4)
        back = window_reverse_nmajor(w, 5, Hp, Wp)
        np.testing.assert_allclose(np.asarray(back[:, :13, :17]), np.asarray(x), rtol=1e-6)
        # same window ordering and token-slot content as the w-major layout
        wm, _ = window_partition(x, 5)
        np.testing.assert_array_equal(np.asarray(w.transpose(1, 0, 2)), np.asarray(wm))

    def test_compute_mask_shape(self):
        m = compute_mask(10, 10, 5, 2)
        assert m.shape == (4, 25, 25)
        vals = np.unique(np.asarray(m))
        assert set(vals.tolist()) <= {-100.0, 0.0}
        # interior window (index 0) is unmasked
        assert np.all(np.asarray(m[0]) == 0)

    def test_normalize_roundtrip(self):
        x = jnp.asarray(np.random.default_rng(0).uniform(0, 1e4, (2, 2, 16, 16)), jnp.float32)
        norm, params = normalize_piecewise(x)
        back = denormalize_piecewise(norm, params)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-3, atol=1e-2)

    def test_ensure_2ch(self):
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 1, 4, 4)), jnp.float32)
        y = ensure_2ch(x)
        assert y.shape == (2, 2, 4, 4)
        np.testing.assert_allclose(np.asarray(y[:, 1]), np.sqrt(np.abs(np.asarray(x[:, 0]))), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(ensure_2ch(y)), np.asarray(y))

    def test_resizes_match_torch(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        x = np.random.default_rng(1).normal(size=(1, 1, 10, 14)).astype(np.float32)
        tx = torch.from_numpy(x)

        want = F.interpolate(tx, scale_factor=2, mode="bilinear", align_corners=False).numpy()
        got = np.asarray(bilinear_resize(jnp.asarray(x), 20, 28))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

        want = F.interpolate(tx, scale_factor=0.5, mode="bilinear", align_corners=False).numpy()
        got = np.asarray(bilinear_downscale_half(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

        want = F.interpolate(tx, scale_factor=2, mode="nearest-exact").numpy()
        got = np.asarray(nearest_exact_resize(jnp.asarray(x), 20, 28))
        np.testing.assert_allclose(got, want, rtol=1e-6)


class TestCheckpoint:
    def test_roundtrip(self):
        from swinwnet_tpu.utils import latest_checkpoint, load_checkpoint, save_checkpoint

        tree = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 3))}}
        with tempfile.TemporaryDirectory() as d:
            save_checkpoint(d, tree, step=3)
            save_checkpoint(d, jax.tree.map(lambda x: x * 2, tree), step=7)
            path = latest_checkpoint(d)
            assert path.endswith("step_00000007")
            restored = load_checkpoint(path, tree)
            np.testing.assert_allclose(np.asarray(restored["a"]), np.arange(4.0) * 2)


class TestShiftedWindows:
    """The reference's shift machinery is dead code with a broadcasting bug
    (SwinWNet.py:328, :147); ours is live — check its invariances."""

    def test_shifted_block_runs_and_constant_input_invariance(self):
        import jax
        from swinwnet_tpu.models.layers import SwinTransformerBlock

        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 10, 10, 12)), jnp.float32)
        blk = SwinTransformerBlock(dim=12, num_heads=3, window_size=5, shift_size=2)
        v = blk.init(jax.random.PRNGKey(0), x)
        y = blk.apply(v, x)
        assert y.shape == x.shape
        assert np.isfinite(np.asarray(y)).all()

        # spatially constant input: every token is identical, so restricting
        # attention (roll + mask) cannot change the output — the shifted block
        # must agree with the unshifted one exactly
        xc = jnp.ones((1, 10, 10, 12), jnp.float32) * 0.3
        blk0 = SwinTransformerBlock(dim=12, num_heads=3, window_size=5, shift_size=0)
        y_shift = blk.apply(v, xc)
        y_plain = blk0.apply(v, xc)
        np.testing.assert_allclose(
            np.asarray(y_shift), np.asarray(y_plain), rtol=1e-5, atol=1e-6
        )

    def test_mask_blocks_cross_region_attention(self):
        from swinwnet_tpu.ops.window import compute_mask

        m = np.asarray(compute_mask(10, 10, 5, 2))
        # boundary windows must contain masked pairs; all values in {0, -100}
        assert (m == -100).any()
        assert set(np.unique(m)) <= {-100.0, 0.0}


class TestCalibration:
    """Round-4 generator-calibration pieces (data/calibration.py)."""

    def test_fit_width_model_closure(self):
        """Render with known (sigma_lambda, r) -> the TOF width fit recovers
        them to grid precision."""
        from swinwnet_tpu.data.calibration import fit_width_model
        from swinwnet_tpu.data.generation import synthesize_pattern

        true_sl, true_r = 0.05, 0.012
        d = [0.9, 1.3, 1.9, 2.6, 3.4]
        img = synthesize_pattern(
            d, [1.0, 0.8, 1.0, 0.9, 1.0], pulse_width=true_sl,
            resolution=true_r, seed=None, background=0.0, counts_scale=1e4,
        ) + 100.0
        mask = (img > 150).astype(np.float32)
        sl, r = fit_width_model(img, mask)
        assert abs(sl - true_sl) <= 0.015, (sl, r)
        assert abs(r - true_r) <= 0.005, (sl, r)

    def test_mask_d_bands_recovers_loci(self):
        """A mask built from arcs at known d's yields band centers near them."""
        from swinwnet_tpu.data.calibration import mask_d_bands
        from swinwnet_tpu.data.generation import synthesize_pattern

        d = [1.2, 2.1, 3.3]
        clean = synthesize_pattern(
            d, [1.0, 1.0, 1.0], pulse_width=0.02, resolution=0.012,
            seed=None, background=0.0,
        )
        mask = (clean > clean.max() * 5e-3).astype(np.uint8)
        bands = mask_d_bands(mask)
        # band centers are pixel-density-weighted histogram maxima, so they
        # sit within ~0.1 A of the arc's d (faint-arc placement, not metrology)
        for dd in d:
            assert np.abs(bands - dd).min() < 0.1, (dd, bands)

    def test_refine_spec_matches_target_table(self):
        """Fixed point: refining against a synthetic 'real' pattern makes the
        re-rendered detected table match it (count within 1, matched d's)."""
        from swinwnet_tpu.data.calibration import (
            detect_union_table,
            extract_crystal_spec,
            refine_crystal_spec,
        )
        from swinwnet_tpu.data.calibration import render_calibrated

        d = [1.35, 1.9, 2.6, 3.2]
        real = render_calibrated(
            d, [0.4, 1.0, 0.25, 0.7], stats=5e8, pulse_duration_us=40.0,
            amp_max=900.0, seed=5, theta_mod=0.0, beam_amp=0.0, speckle_k=0.8,
        )
        from swinwnet_tpu.data.generation import synthesize_pattern
        from swinwnet_tpu.data.calibration import pulse_width_for_duration

        clean = synthesize_pattern(
            d, [0.4, 1.0, 0.25, 0.7], seed=None, background=0.0,
            pulse_width=pulse_width_for_duration(40.0), resolution=0.0145,
        )
        mask = (clean > clean.max() * 5e-3).astype(np.float32)
        target = detect_union_table(real, mask)
        spec = extract_crystal_spec(real, mask)
        refined = refine_crystal_spec(spec, real, mask, iters=3)
        got = render_calibrated(
            refined["d"], refined["intensity"], stats=5e8,
            pulse_duration_us=refined["pulse_duration_us"],
            amp_max=refined["amp_max"], seed=77,
            resolution=refined["resolution"], theta_mod=0.0, beam_amp=0.0,
            speckle_k=0.8,
        )
        got_t = detect_union_table(got, mask)
        assert abs(len(got_t) - len(target)) <= 1, (len(got_t), len(target))
        t_d = np.array([p["d_com"] for p in target])
        hit = sum(1 for p in got_t if np.abs(t_d - p["d_com"]).min() < 0.05)
        assert hit >= len(target) - 1, (hit, len(target))


class TestThetaFlipAugment:
    def test_joint_flip(self):
        from swinwnet_tpu.data.noise import make_theta_flip_augment

        rng = np.random.default_rng(0)
        images = np.arange(4 * 1 * 2 * 6, dtype=np.float32).reshape(4, 1, 2, 6)
        masks = (images[:, 0] % 2).astype(np.float32)
        aug = make_theta_flip_augment(p=1.0)
        fi, fm = aug(rng, images, masks)
        # every sample mirrored along W, image and mask together
        np.testing.assert_array_equal(fi, images[..., ::-1])
        np.testing.assert_array_equal(fm, masks[..., ::-1])
        # inputs untouched (copy semantics)
        assert images[0, 0, 0, 0] == 0.0

    def test_p_zero_is_identity_and_masks_optional(self):
        from swinwnet_tpu.data.noise import make_theta_flip_augment

        rng = np.random.default_rng(1)
        images = np.random.default_rng(2).normal(size=(3, 1, 4, 5)).astype(np.float32)
        aug = make_theta_flip_augment(p=0.0)
        fi, fm = aug(rng, images, None)
        np.testing.assert_array_equal(fi, images)
        assert fm is None

    def test_loader_joint_augment_keeps_pairs_aligned(self):
        from swinwnet_tpu.data.noise import make_theta_flip_augment

        images = np.arange(8 * 3 * 4, dtype=np.float32).reshape(8, 3, 4)
        masks = images.copy()
        loader = ArrayLoader(
            images, masks, batch_size=4, joint_augment=make_theta_flip_augment(p=0.5),
            seed=11,
        )
        flipped_any = False
        for bi, bm in loader:
            # image channel 0 must stay equal to its mask whether flipped or not
            np.testing.assert_array_equal(bi[:, 0], bm)
            flipped_any = flipped_any or not np.array_equal(bi[:, 0], images[: len(bm)])
        assert loader.n_samples == 8
