"""Native C++ prefetching batcher: correctness vs the python loader."""

import numpy as np
import pytest

from swinwnet_tpu.data.native_loader import NativeBatcher

pytestmark = pytest.mark.skipif(
    not NativeBatcher.available(), reason="no C++ toolchain for the native batcher"
)


def test_matches_python_semantics():
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 100, (10, 8, 12)).astype(np.float32)
    masks = (rng.uniform(size=(10, 8, 12)) > 0.5).astype(np.float32)

    nb = NativeBatcher(images, masks, batch_size=4, shuffle=False)
    assert len(nb) == 3
    batches = list(nb)
    nb.close()

    # ArrayLoader contract: [B,1,H,W] images (ensure_2ch runs on device)
    assert batches[0][0].shape == (4, 1, 8, 12)
    assert batches[2][0].shape == (2, 1, 8, 12)
    np.testing.assert_allclose(batches[0][0][:, 0], images[:4], rtol=1e-6)
    np.testing.assert_allclose(batches[0][1], masks[:4])


def test_eval_noise_protocol():
    """mu_lo == mu_hi == 100, sigma_frac 0.2 reproduces N(100, 20)."""
    images = np.zeros((4, 64, 64), np.float32)
    nb = NativeBatcher(images, None, batch_size=4, shuffle=False, add_noise=True,
                       noise_mu_range=(100.0, 100.0), sigma_frac=0.2, seed=1)
    imgs, msks, n = nb.next()
    nb.close()
    assert n == 4
    assert abs(imgs.mean() - 100.0) < 2.0
    assert abs(imgs.std() - 20.0) < 2.0
    assert msks is None


def test_train_noise_randomized_mu():
    """Per-batch mu ~ U(0,150): different batches see different mu levels,
    and the same seed reproduces the same stream (determinism)."""
    images = np.zeros((32, 32, 32), np.float32)

    def stream(seed):
        nb = NativeBatcher(images, None, batch_size=4, shuffle=False,
                           add_noise=True, noise_mu_range=(0.0, 150.0), seed=seed)
        out = [nb.next()[0] for _ in range(8)]
        nb.close()
        return out

    a, b = stream(7), stream(7)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    mus = np.array([x.mean() for x in a])
    assert mus.std() > 10.0  # mu really varies per batch
    assert 0.0 <= mus.min() and mus.max() <= 160.0


def test_shuffle_covers_all():
    images = np.arange(8, dtype=np.float32).reshape(8, 1, 1)
    nb = NativeBatcher(images, None, batch_size=8, shuffle=True, seed=2)
    imgs, _, n = nb.next()
    nb.close()
    assert n == 8
    np.testing.assert_array_equal(np.sort(imgs[:, 0, 0, 0]), np.arange(8))
