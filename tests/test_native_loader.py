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

    assert batches[0][0].shape == (4, 2, 8, 12)
    assert batches[2][0].shape == (2, 2, 8, 12)
    np.testing.assert_allclose(batches[0][0][:, 0], images[:4], rtol=1e-6)
    np.testing.assert_allclose(batches[0][0][:, 1], np.sqrt(np.abs(images[:4])), rtol=1e-6)
    np.testing.assert_allclose(batches[0][1], masks[:4])


def test_noise_protocol():
    images = np.zeros((4, 16, 16), np.float32)
    nb = NativeBatcher(images, None, batch_size=4, shuffle=False, add_noise=True,
                       noise_mu=100.0, noise_sigma=20.0, seed=1)
    imgs, msks, n = nb.next()
    nb.close()
    assert n == 4
    assert 80 < imgs[:, 0].mean() < 120
    assert msks is None or True


def test_shuffle_covers_all():
    images = np.arange(8, dtype=np.float32).reshape(8, 1, 1)
    nb = NativeBatcher(images, None, batch_size=8, shuffle=True, seed=2)
    imgs, _, n = nb.next()
    nb.close()
    assert n == 8
    np.testing.assert_array_equal(np.sort(imgs[:, 0, 0, 0]), np.arange(8))
