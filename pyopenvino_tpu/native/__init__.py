"""ctypes bindings for the native host-runtime library (libtpuov_native).

Builds on first use (g++ via the Makefile — pybind11 is not available in
this environment, so the ABI is plain C over ctypes).  Every entry point has
a pure-numpy fallback, so the framework works without a toolchain; the
native path is the production data-loader tier (multi-threaded image →
NCHW blob conversion, fp16 weight decode, batch stacking) feeding the
serving layer.
"""

from __future__ import annotations

import ctypes
import os
import queue
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libtpuov_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        # serialize concurrent builders (mp_worker fleet, pytest-xdist):
        # two g++ links writing the same .so hand a half-written file to
        # whichever process dlopens first
        import fcntl

        with open(os.path.join(_DIR, ".build.lock"), "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            subprocess.run(
                ["make", "-s", "libtpuov_native.so"],
                cwd=_DIR, check=True, capture_output=True, timeout=120,
            )
        return True
    except Exception:  # noqa: BLE001 — any failure → numpy fallback
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        # always run make: a stale .so from an older source revision would
        # fail the ABI check below and silently lose the native tier
        if not _build() and not os.path.exists(_LIB_PATH):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.ov_native_abi_version.restype = ctypes.c_int
            if lib.ov_native_abi_version() != 3:
                return None
            lib.ov_fp16_to_fp32.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
            ]
            lib.ov_preprocess_batch.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ]
            lib.ov_preprocess_batch_u8.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_int,
            ]
            lib.ov_stack_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int,
            ]
            lib.ov_loader_create.restype = ctypes.c_void_p
            lib.ov_loader_create.argtypes = [
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
            lib.ov_loader_submit.restype = ctypes.c_int64
            lib.ov_loader_submit.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ]
            lib.ov_loader_next.restype = ctypes.c_int64
            lib.ov_loader_next.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ]
            lib.ov_loader_close.argtypes = [ctypes.c_void_p]
            lib.ov_loader_destroy.argtypes = [ctypes.c_void_p]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def _nthreads() -> int:
    return max(1, min(16, os.cpu_count() or 1))


def fp16_to_fp32(src: np.ndarray) -> np.ndarray:
    """Decode an fp16 array to fp32 (native, threaded; numpy fallback)."""
    src = np.ascontiguousarray(src, dtype=np.float16)
    lib = _load()
    if lib is None:
        return src.astype(np.float32)
    out = np.empty(src.shape, np.float32)
    lib.ov_fp16_to_fp32(
        src.ctypes.data, out.ctypes.data, src.size, _nthreads()
    )
    return out


def preprocess_batch(
    imgs: np.ndarray,
    out_hw,
    scale: Optional[np.ndarray] = None,
    bias: Optional[np.ndarray] = None,
    u8_out: bool = False,
) -> np.ndarray:
    """(B, H, W, C) uint8 → (B, C, oh, ow) float32 bilinear-resized blobs,
    out = px*scale + bias per channel (the serving input pipeline).

    ``u8_out`` keeps the blob uint8 (scale/bias must be None): the
    u8-ingress path — cast/scale run on-device via PrePostProcessor
    set_element_type("u8"), and the host→device copy is 1 byte/px."""
    imgs = np.ascontiguousarray(imgs, dtype=np.uint8)
    b, ih, iw, c = imgs.shape
    oh, ow = out_hw
    if u8_out:
        if scale is not None or bias is not None:
            raise ValueError(
                "u8_out keeps raw pixels — put scale/bias on-device "
                "(PrePostProcessor), not in the loader"
            )
        lib = _load()
        out = np.empty((b, c, oh, ow), np.uint8)
        if lib is None:
            f = _preprocess_numpy(imgs, (oh, ow), None, None)
            # match the native kernel's round-half-up exactly
            return np.clip(np.floor(f + 0.5), 0, 255).astype(np.uint8)
        lib.ov_preprocess_batch_u8(
            imgs.ctypes.data, b, ih, iw, c, out.ctypes.data, oh, ow,
            _nthreads(),
        )
        return out
    lib = _load()
    if lib is None:
        return _preprocess_numpy(imgs, (oh, ow), scale, bias)
    out = np.empty((b, c, oh, ow), np.float32)
    sc = (
        np.ascontiguousarray(scale, np.float32)
        if scale is not None else None
    )
    bi = np.ascontiguousarray(bias, np.float32) if bias is not None else None
    lib.ov_preprocess_batch(
        imgs.ctypes.data, b, ih, iw, c, out.ctypes.data, oh, ow,
        sc.ctypes.data if sc is not None else None,
        bi.ctypes.data if bi is not None else None,
        _nthreads(),
    )
    return out


def _preprocess_numpy(imgs, out_hw, scale, bias):
    """Fallback: vectorized bilinear with align-corners sampling (matches
    the native kernel exactly in exact-arithmetic terms)."""
    b, ih, iw, c = imgs.shape
    oh, ow = out_hw
    # float32 coordinate math to match the native kernel's neighbor picks
    fy = (
        np.arange(oh, dtype=np.float32)
        * np.float32((ih - 1) / (oh - 1))
        if oh > 1 else np.zeros(oh, np.float32)
    )
    fx = (
        np.arange(ow, dtype=np.float32)
        * np.float32((iw - 1) / (ow - 1))
        if ow > 1 else np.zeros(ow, np.float32)
    )
    y0 = fy.astype(np.int64)
    x0 = fx.astype(np.int64)
    y1 = np.minimum(y0 + 1, ih - 1)
    x1 = np.minimum(x0 + 1, iw - 1)
    wy = (fy - y0).astype(np.float32)[:, None, None]
    wx = (fx - x0).astype(np.float32)[None, :, None]
    f = imgs.astype(np.float32)
    top = (1 - wx) * f[:, y0][:, :, x0] + wx * f[:, y0][:, :, x1]
    bot = (1 - wx) * f[:, y1][:, :, x0] + wx * f[:, y1][:, :, x1]
    out = (1 - wy) * top + wy * bot  # (B, oh, ow, C)
    if scale is not None:
        out = out * np.asarray(scale, np.float32)
    if bias is not None:
        out = out + np.asarray(bias, np.float32)
    return np.ascontiguousarray(out.transpose(0, 3, 1, 2))


def stack_f32(blobs) -> np.ndarray:
    """Stack per-example float32 blobs into one contiguous batch (the
    server's coalescing step) via parallel native memcpy."""
    blobs = [np.ascontiguousarray(x, np.float32) for x in blobs]
    lib = _load()
    if lib is None:
        return np.stack(blobs, axis=0)
    b = len(blobs)
    elems = blobs[0].size
    out = np.empty((b,) + blobs[0].shape, np.float32)
    ptrs = (ctypes.c_void_p * b)(
        *[x.ctypes.data for x in blobs]
    )
    lib.ov_stack_f32(ptrs, b, elems, out.ctypes.data, _nthreads())
    return out


class AsyncLoader:
    """Asynchronous prefetching data loader: uint8 image batches in, NCHW
    float32 blobs out, preprocessed by a background C++ worker pool so input
    preparation overlaps device compute (the reference prepares every input
    synchronously inside its demo loop — draw-and-infer.py:54-76).

    Results come back strictly in submission order; `depth` bounds the
    in-flight window (submit blocks when full).  Falls back to a Python
    thread pool (same semantics, numpy kernel) without a toolchain.

        with AsyncLoader((ih, iw, c), (oh, ow)) as ld:
            for imgs in stream: ld.submit(imgs)   # producer thread
            ...
            blob = ld.next()                      # consumer, in order
    """

    def __init__(self, in_shape, out_hw, scale=None, bias=None,
                 workers: int = 0, depth: int = 4, u8_out: bool = False):
        self.ih, self.iw, self.c = in_shape
        self.oh, self.ow = out_hw
        self.u8_out = bool(u8_out)
        if self.u8_out and (scale is not None or bias is not None):
            raise ValueError(
                "u8_out keeps raw pixels — put scale/bias on-device "
                "(PrePostProcessor), not in the loader"
            )
        self._scale = (
            np.ascontiguousarray(scale, np.float32)
            if scale is not None else None
        )
        self._bias = (
            np.ascontiguousarray(bias, np.float32)
            if bias is not None else None
        )
        workers = workers or max(1, min(8, (os.cpu_count() or 2) - 1))
        self._batches: "queue.SimpleQueue[int]" = queue.SimpleQueue()
        self._lib = _load()
        self._handle = None
        self._pool = None
        self._futs = None
        if self._lib is not None:
            self._handle = ctypes.c_void_p(self._lib.ov_loader_create(
                self.ih, self.iw, self.c, self.oh, self.ow,
                self._scale.ctypes.data if self._scale is not None else None,
                self._bias.ctypes.data if self._bias is not None else None,
                workers, depth, int(self.u8_out),
            ))
        else:
            import concurrent.futures

            self._pool = concurrent.futures.ThreadPoolExecutor(workers)
            self._futs = queue.Queue(maxsize=depth)
        self._closed = False
        # serializes (native submit → size-queue put) so multiple producer
        # threads cannot desynchronize sequence ids from the size queue
        self._submit_lock = threading.Lock()

    @property
    def native(self) -> bool:
        return self._handle is not None

    def submit(self, imgs: np.ndarray) -> None:
        """imgs: (B, ih, iw, c) uint8.  Blocks while `depth` batches are
        already in flight."""
        if self._closed:
            raise RuntimeError("loader is closed")
        imgs = np.ascontiguousarray(imgs, np.uint8)
        b, ih, iw, c = imgs.shape
        if (ih, iw, c) != (self.ih, self.iw, self.c):
            raise ValueError(
                f"image shape {(ih, iw, c)} != loader {(self.ih, self.iw, self.c)}"
            )
        with self._submit_lock:
            if self._handle is not None:
                seq = self._lib.ov_loader_submit(
                    self._handle, imgs.ctypes.data, b
                )
                if seq < 0:
                    raise RuntimeError("loader is closed")
            else:
                if self.u8_out:
                    self._futs.put(self._pool.submit(
                        preprocess_batch, imgs.copy(), (self.oh, self.ow),
                        None, None, True,
                    ))
                else:
                    self._futs.put(self._pool.submit(
                        _preprocess_numpy, imgs.copy(), (self.oh, self.ow),
                        self._scale, self._bias,
                    ))
            self._batches.put(b)

    def next(self):
        """The next blob in submission order: (B, c, oh, ow) float32, or
        None when the loader is closed and drained.  Blocks while the next
        batch is still being preprocessed (outside the GIL on the native
        path, so producers keep running)."""
        b = self._batches.get()  # None = close() sentinel
        if b is None:
            self._batches.put(None)  # keep the drained state sticky
            return None
        if self._handle is not None:
            dtype = np.uint8 if self.u8_out else np.float32
            out = np.empty((b, self.c, self.oh, self.ow), dtype)
            n = self._lib.ov_loader_next(self._handle, out.ctypes.data, out.size)
            if n <= 0:
                return None
            assert n == b, (n, b)
            return out
        return self._futs.get().result()

    def __iter__(self):
        while True:
            blob = self.next()
            if blob is None:
                return
            yield blob

    def close(self):
        """No further submits; pending batches stay retrievable."""
        self._closed = True
        if self._handle is not None:
            self._lib.ov_loader_close(self._handle)
        elif self._pool is not None:
            self._pool.shutdown(wait=False)
        self._batches.put(None)  # wake a consumer blocked in next()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        h, self._handle = self._handle, None
        if h is not None:
            self._lib.ov_loader_destroy(h)
        if self._pool is not None:
            self._pool.shutdown(wait=True)

    def __del__(self):  # safety net for non-context use
        h, self._handle = getattr(self, "_handle", None), None
        if h is not None:
            self._lib.ov_loader_destroy(h)
