"""ctypes binding of the native C++ prefetching batcher
(swinwnet_tpu/native/batcher.cpp).

Compiles the shared library on first use (g++, cached beside the source) and
exposes the same iteration protocol as `ArrayLoader` — (images [B,1,H,W],
masks [B,H,W]) per batch — but with batch assembly (index gather + the
noise-injection protocols) running in a C++ worker thread that stays one
batch ahead of the accelerator. Falls back cleanly when a compiler is
unavailable (`NativeBatcher.available()`).

Noise semantics match `data/noise.py`: one mu ~ U(*noise_mu_range) draw per
batch, additive N(mu, sigma_frac * mu) per pixel — the train augmentation is
the default range (0, 150); the published eval protocol N(100, 20) is
noise_mu_range=(100, 100). The RNG streams are C++ std::mt19937_64, so exact
sample values differ from the numpy loader (the distributions are the
protocol; tests assert distributional + determinism properties).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "native", "batcher.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "..", "native", "libbatcher.so")
_lock = threading.Lock()
_lib = None


def _build() -> Optional[ctypes.CDLL]:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        src = os.path.abspath(_SRC)
        lib_path = os.path.abspath(_LIB)
        if not os.path.exists(lib_path) or os.path.getmtime(lib_path) < os.path.getmtime(src):
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", lib_path, "-pthread"],
                    check=True,
                    capture_output=True,
                )
            except (OSError, subprocess.CalledProcessError):
                return None
        lib = ctypes.CDLL(lib_path)
        lib.batcher_create.restype = ctypes.c_void_p
        lib.batcher_create.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_float,
            ctypes.c_float,
            ctypes.c_float,
            ctypes.c_uint64,
        ]
        lib.batcher_next.restype = ctypes.c_int64
        lib.batcher_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.batcher_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class NativeBatcher:
    """Iterator of ([B,1,H,W] images, [B,H,W] masks) with C++ prefetch.

    Drop-in for `ArrayLoader` in the trainers (`train/trainers.py` iterate
    `for images, masks in loader` once per epoch): each `__iter__` yields one
    epoch's worth of batches from an endless internally-reshuffling stream.
    """

    def __init__(
        self,
        images: np.ndarray,
        masks: Optional[np.ndarray] = None,
        batch_size: int = 8,
        shuffle: bool = True,
        add_noise: bool = False,
        noise_mu_range: Tuple[float, float] = (0.0, 150.0),
        sigma_frac: float = 0.2,
        seed: int = 0,
    ):
        lib = _build()
        if lib is None:
            raise RuntimeError("native batcher unavailable (no g++?) — use ArrayLoader")
        self._lib = lib
        # keep sources alive + contiguous for the lifetime of the handle
        self._images = np.ascontiguousarray(images, dtype=np.float32)
        if self._images.ndim == 4:
            self._images = np.ascontiguousarray(self._images[:, 0])
        self._masks = (
            np.ascontiguousarray(masks, dtype=np.float32) if masks is not None else None
        )
        N, H, W = self._images.shape
        self.batch_size = batch_size
        self.N, self.H, self.W = N, H, W
        self._handle = lib.batcher_create(
            _fptr(self._images),
            _fptr(self._masks) if self._masks is not None else None,
            N,
            H,
            W,
            batch_size,
            int(shuffle),
            int(add_noise),
            float(noise_mu_range[0]),
            float(noise_mu_range[1]),
            float(sigma_frac),
            seed,
        )

    @staticmethod
    def available() -> bool:
        return _build() is not None

    @property
    def n_samples(self) -> int:
        return self.N

    @property
    def batches_per_epoch(self) -> int:
        return (self.N + self.batch_size - 1) // self.batch_size

    def next(self) -> Tuple[np.ndarray, Optional[np.ndarray], int]:
        imgs = np.empty((self.batch_size, 1, self.H, self.W), np.float32)
        msks = np.empty((self.batch_size, self.H, self.W), np.float32)
        n = self._lib.batcher_next(self._handle, _fptr(imgs), _fptr(msks))
        return imgs, (msks if self._masks is not None else None), int(n)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, Optional[np.ndarray]]]:
        """One epoch's worth of batches (reference loader protocol)."""
        for _ in range(self.batches_per_epoch):
            imgs, msks, n = self.next()
            yield imgs[:n], (msks[:n] if msks is not None else None)

    def __len__(self) -> int:
        return self.batches_per_epoch

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.batcher_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
