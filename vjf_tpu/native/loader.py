"""Python bindings for the native streaming loader + device prefetching.

The native side (``src/stream_loader.cpp``) is a threaded ring buffer over
a file/FIFO; this side builds it on demand (cached ``.so``), exposes an
iterator of fixed-shape chunks, falls back to pure-Python file reads where
no compiler is available, and adds double-buffered ``jax.device_put`` so
host IO and device compute overlap.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from queue import Queue
from typing import Iterator, Optional

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_NATIVE_DIR, "libvjfstream.so")
_FAIL_MARKER = os.path.join(_NATIVE_DIR, ".build_failed")
_SRC_PATH = os.path.join(_NATIVE_DIR, "src", "stream_loader.cpp")
_lib = None
_lib_tried = False


def _build_failed_cached() -> bool:
    """A persisted failure marker (keyed to the source mtime) skips the
    120s-bounded compiler subprocess on every later process in a
    compiler-less environment (r1 advisor finding)."""
    try:
        return os.path.getmtime(_FAIL_MARKER) >= os.path.getmtime(_SRC_PATH)
    except OSError:
        return False


def _load_native() -> Optional[ctypes.CDLL]:
    """Build (once per environment) and load the native library; None if
    unavailable — with the failure cached on disk and logged once, so the
    pure-Python fallback is observable, not silent."""
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    def _so_stale() -> bool:
        # a prebuilt .so older than the source silently shadows source
        # edits; stale is treated exactly like missing (make rebuilds)
        try:
            return os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC_PATH)
        except OSError:
            return True

    try:
        missing = not os.path.exists(_SO_PATH)
        if missing or _so_stale():
            built = False
            if _build_failed_cached():
                logger.warning(
                    "native stream loader build unavailable (cached build "
                    "failure at %s; delete it to retry)", _FAIL_MARKER,
                )
            else:
                try:
                    subprocess.run(
                        ["make", "-C", _NATIVE_DIR],
                        check=True,
                        capture_output=True,
                        timeout=120,
                    )
                    built = True
                except Exception as e:
                    try:
                        with open(_FAIL_MARKER, "w") as f:
                            f.write(f"{type(e).__name__}: {e}\n")
                    except OSError:
                        pass
                    logger.warning(
                        "native stream loader build failed (%s); failure "
                        "cached at %s", e, _FAIL_MARKER,
                    )
            if not built:
                if missing:
                    logger.warning("using the Python fallback loader")
                    return None
                # a stale prebuilt is still a working loader — prefer it
                # over the Python fallback, loudly (source edits are NOT
                # in effect until a toolchain rebuilds it)
                logger.warning(
                    "loading STALE prebuilt %s (source is newer and the "
                    "rebuild did not run)", _SO_PATH,
                )
        lib = ctypes.CDLL(_SO_PATH)
        lib.vjf_stream_open.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64]
        lib.vjf_stream_open.restype = ctypes.c_int64
        lib.vjf_stream_read.argtypes = [
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
        ]
        lib.vjf_stream_read.restype = ctypes.c_int64
        lib.vjf_stream_close.argtypes = [ctypes.c_int64]
        lib.vjf_stream_close.restype = None
        _lib = lib
    except Exception:
        _lib = None
    return _lib


class StreamingLoader:
    """Iterate fixed-shape chunks ``(chunk, batch, ydim)`` from a binary
    stream of per-step records (row-major ``batch * ydim`` values).

    Uses the native ring-buffer reader when the toolchain is available
    (overlapping ingest with compute), pure-Python ``np.fromfile`` chunks
    otherwise — identical semantics either way. The final partial chunk is
    zero-padded and its true length reported via ``last_valid``.
    """

    def __init__(
        self,
        path: str,
        ydim: int,
        batch: int = 1,
        chunk: int = 256,
        dtype=np.float32,
        capacity_chunks: int = 8,
        native: Optional[bool] = None,
    ):
        self.path = path
        self.ydim = ydim
        self.batch = batch
        self.chunk = chunk
        self.dtype = np.dtype(dtype)
        self.step_bytes = self.batch * self.ydim * self.dtype.itemsize
        self.last_valid = chunk
        self._handle = None
        self._fp = None

        lib = _load_native() if native in (None, True) else None
        if native is True and lib is None:
            raise RuntimeError("native loader requested but unavailable")
        if lib is not None:
            h = lib.vjf_stream_open(
                path.encode(), self.step_bytes, capacity_chunks * chunk
            )
            if h > 0:
                self._handle = h
                self._lib = lib
                return
        self._fp = open(path, "rb")

    @property
    def is_native(self) -> bool:
        return self._handle is not None

    def __iter__(self) -> Iterator[np.ndarray]:
        return self

    def __next__(self) -> np.ndarray:
        buf = np.zeros((self.chunk, self.batch, self.ydim), dtype=self.dtype)
        if self._handle is not None:
            ptr = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
            got = int(self._lib.vjf_stream_read(self._handle, ptr, self.chunk))
        else:
            raw = self._fp.read(self.step_bytes * self.chunk)
            got = len(raw) // self.step_bytes
            if got:
                buf[:got] = np.frombuffer(
                    raw[: got * self.step_bytes], dtype=self.dtype
                ).reshape(got, self.batch, self.ydim)
        if got <= 0:
            self.close()
            raise StopIteration
        self.last_valid = got
        return buf

    def close(self) -> None:
        if self._handle is not None:
            self._lib.vjf_stream_close(self._handle)
            self._handle = None
        if self._fp is not None:
            self._fp.close()
            self._fp = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def device_prefetch(iterator, depth: int = 2, valid_fn=None):
    """Wrap a host chunk iterator with a background thread that stages
    chunks onto the device ahead of consumption (host->device transfer
    overlaps device compute).

    ``valid_fn`` (e.g. ``lambda: loader.last_valid``): sampled on the
    producer thread immediately after each chunk is drawn, yielding
    ``(device_chunk, n_valid)`` pairs — the pairing ``filter_stream``
    consumes directly. This matters: with prefetch running ``depth``
    chunks ahead, a consumer-side ``valid_fn()`` would report a LATER
    chunk's count (e.g. the final partial chunk's, wrongly truncating an
    earlier full chunk)."""
    import jax

    import queue as _queue

    q: Queue = Queue(maxsize=depth)
    _SENTINEL = object()
    stop = threading.Event()     # consumer abandoned the generator

    def _put(item) -> bool:
        # bounded-queue put that gives up when the consumer is gone —
        # a plain q.put would block forever once the queue fills, leaking
        # this thread AND the source loader (never driven to EOF/close)
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except _queue.Full:
                continue
        return False

    def worker():
        # Producer exceptions (iterator.__next__, the user's valid_fn, or
        # device_put) must reach the consumer — swallowing them here would
        # end the stream cleanly and silently train on a truncated stream.
        try:
            for item in iterator:
                v = valid_fn() if valid_fn is not None else None
                d = jax.device_put(item)
                if not _put(d if v is None else (d, v)):
                    return
            _put(_SENTINEL)
        except BaseException as e:  # noqa: BLE001 — re-raised in consumer
            _put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()               # unblock a producer stuck on a full queue
