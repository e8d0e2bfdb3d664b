"""ctypes bindings for the native C++ ray store (``native/raystore.cpp``).

The big-scene data path: when the flattened pixel table exceeds device HBM
(full-res LLFF captures reach multiple GB), the table stays host-side —
owned or mmap'd — and batches are assembled by C++ background threads into a
ring buffer, deterministically (a counter-based PRNG makes batch ``i``
identical regardless of thread timing). This replaces the reference's
4-process torch DataLoader (``nerf.py:424``, ``loader.py:61-133``) with a
zero-dependency single-process design.

The library is compiled on demand with the system g++ (no pybind11 in this
image; plain C ABI via ctypes). :class:`NumpyRayStore` is an API-compatible
pure-python fallback for hosts without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "raystore.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "build", "libraystore.so")

_lib_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False

Batch = Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]


def _build_library() -> None:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def _load_library() -> Optional[ctypes.CDLL]:
    """Compile (if stale) and dlopen the raystore; None when unavailable."""
    global _lib, _lib_failed
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _lib_failed:
            return None
        try:
            if (not os.path.isfile(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _build_library()
            lib = ctypes.CDLL(_SO)
        except (OSError, subprocess.CalledProcessError):
            _lib_failed = True
            return None

        lib.rs_create.restype = ctypes.c_void_p
        lib.rs_create.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64]
        lib.rs_create_mmap.restype = ctypes.c_void_p
        lib.rs_create_mmap.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64]
        lib.rs_sample.restype = None
        lib.rs_sample.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        lib.rs_prefetch_start.restype = None
        lib.rs_prefetch_start.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        lib.rs_next.restype = ctypes.c_int64
        lib.rs_next.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        lib.rs_destroy.restype = None
        lib.rs_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def _out_buffers(batch: int) -> Batch:
    return (np.empty(batch, np.float32), np.empty(batch, np.float32),
            np.empty((batch, 3), np.float32), np.empty((batch, 17), np.float32),
            np.empty(batch, np.int32))


class HostRayStore:
    """Native threaded ray-batch source over a host-resident pixel table.

    API::

        store = HostRayStore(pixels, poses, height, width, seed=624)
        rows, cols, rgb, pose, pic = store.sample(batch_index, batch)  # sync
        store.start(batch, depth=3)   # background prefetch ring
        rows, cols, rgb, pose, pic = store.next()
        store.close()

    ``pixels`` is (num_pix, 3) float32 or uint8 (uint8 is dequantized to
    float32 in C++); ``poses`` is (num_pics, 17) float32. Batches are
    deterministic in (seed, batch_index) — the prefetched stream equals the
    synchronous one.
    """

    def __init__(self, pixels: np.ndarray, poses: np.ndarray, height: int,
                 width: int, seed: int = 0):
        lib = _load_library()
        if lib is None:
            raise RuntimeError("native raystore unavailable (no C++ toolchain)")
        self._lib = lib
        is_u8 = pixels.dtype == np.uint8
        pixels = np.ascontiguousarray(
            pixels, dtype=np.uint8 if is_u8 else np.float32)
        poses = np.ascontiguousarray(poses, dtype=np.float32)
        self._handle = lib.rs_create(
            pixels.ctypes.data_as(ctypes.c_void_p), int(is_u8),
            pixels.shape[0],
            poses.ctypes.data_as(ctypes.c_void_p), poses.shape[0],
            int(height), int(width), ctypes.c_uint64(seed))
        if not self._handle:
            raise RuntimeError("rs_create failed")
        self._batch = 0

    @classmethod
    def from_pixel_file(cls, pixel_path: str, is_u8: bool, num_pix: int,
                        poses: np.ndarray, height: int, width: int,
                        seed: int = 0) -> "HostRayStore":
        """Zero-copy store over a raw little-endian pixel file (mmap'd) — for
        tables that must not be duplicated in host RAM."""
        lib = _load_library()
        if lib is None:
            raise RuntimeError("native raystore unavailable (no C++ toolchain)")
        self = cls.__new__(cls)
        self._lib = lib
        poses = np.ascontiguousarray(poses, dtype=np.float32)
        self._handle = lib.rs_create_mmap(
            pixel_path.encode(), int(is_u8), int(num_pix),
            poses.ctypes.data_as(ctypes.c_void_p), poses.shape[0],
            int(height), int(width), ctypes.c_uint64(seed))
        if not self._handle:
            raise RuntimeError(
                f"rs_create_mmap failed for {pixel_path} (missing or "
                f"shorter than {num_pix} pixels)")
        self._batch = 0
        return self

    @staticmethod
    def available() -> bool:
        return _load_library() is not None

    def sample(self, batch_index: int, batch: int) -> Batch:
        """Synchronous deterministic draw of one batch (no prefetch thread).
        Must not be mixed with a running prefetcher."""
        rows, cols, rgb, pose, pic = _out_buffers(batch)
        self._lib.rs_sample(
            self._handle, int(batch_index), int(batch),
            rows.ctypes.data_as(ctypes.c_void_p),
            cols.ctypes.data_as(ctypes.c_void_p),
            rgb.ctypes.data_as(ctypes.c_void_p),
            pose.ctypes.data_as(ctypes.c_void_p),
            pic.ctypes.data_as(ctypes.c_void_p))
        return rows, cols, rgb, pose, pic

    def start(self, batch: int, depth: int = 3) -> None:
        """Start the background prefetcher with a ``depth``-slot ring."""
        self._batch = int(batch)
        self._lib.rs_prefetch_start(self._handle, int(batch), int(depth))

    def next(self) -> Batch:
        """Blocking take of the next prefetched batch."""
        rows, cols, rgb, pose, pic = _out_buffers(self._batch)
        self._lib.rs_next(
            self._handle,
            rows.ctypes.data_as(ctypes.c_void_p),
            cols.ctypes.data_as(ctypes.c_void_p),
            rgb.ctypes.data_as(ctypes.c_void_p),
            pose.ctypes.data_as(ctypes.c_void_p),
            pic.ctypes.data_as(ctypes.c_void_p))
        return rows, cols, rgb, pose, pic

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.rs_destroy(self._handle)
            self._handle = None

    def __del__(self):  # best-effort; close() is the real contract
        try:
            self.close()
        except Exception:
            pass


class NumpyRayStore:
    """Pure-python fallback with the :class:`HostRayStore` API (deterministic
    in (seed, batch_index) via a per-batch Philox stream; synchronous —
    ``next()`` draws on demand)."""

    def __init__(self, pixels: np.ndarray, poses: np.ndarray, height: int,
                 width: int, seed: int = 0):
        self._u8 = pixels.dtype == np.uint8
        self._pixels = pixels
        self._poses = np.asarray(poses, np.float32)
        self._pic_size = int(height) * int(width)
        self._width = int(width)
        self._seed = int(seed)
        self._batch = 0
        self._next_index = 0

    @staticmethod
    def available() -> bool:
        return True

    def sample(self, batch_index: int, batch: int) -> Batch:
        rng = np.random.Generator(
            np.random.Philox(key=self._seed, counter=[0, 0, 0, batch_index]))
        idx = rng.integers(0, self._pixels.shape[0], batch)
        pic = (idx // self._pic_size).astype(np.int32)
        in_pic = idx % self._pic_size
        rgb = self._pixels[idx]
        if self._u8:
            rgb = rgb.astype(np.float32) * (1.0 / 255.0)
        return ((in_pic // self._width).astype(np.float32),
                (in_pic % self._width).astype(np.float32),
                np.ascontiguousarray(rgb, np.float32),
                self._poses[pic], pic)

    def start(self, batch: int, depth: int = 3) -> None:
        self._batch = int(batch)
        self._next_index = 0

    def next(self) -> Batch:
        out = self.sample(self._next_index, self._batch)
        self._next_index += 1
        return out

    def close(self) -> None:
        pass


def make_ray_store(pixels: np.ndarray, poses: np.ndarray, height: int,
                   width: int, seed: int = 0):
    """The native store when the toolchain is present, numpy otherwise."""
    if HostRayStore.available():
        return HostRayStore(pixels, poses, height, width, seed=seed)
    return NumpyRayStore(pixels, poses, height, width, seed=seed)
