"""Native-backed video data pipeline (SURVEY.md C18).

Wraps the C++ frame generator (native/framegen.cpp, built to
libframegen.so) through ctypes, and provides a double-buffered prefetch
pipeline that overlaps host-side frame production with device compute —
the role the reference's OpenCV decode thread plays. Falls back to the
pure-NumPy SpriteVideo when the shared library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import queue
import subprocess
import threading
from typing import Iterator, Optional

import numpy as np

from .video import SpriteVideo, SpriteVideoConfig

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libframegen.so")
_lib = None


def _load_lib(build: bool = True):
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build:
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.fg_create.restype = ctypes.c_void_p
    lib.fg_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int,
                              ctypes.c_int, ctypes.c_int, ctypes.c_float,
                              ctypes.c_float, ctypes.c_uint64]
    lib.fg_destroy.argtypes = [ctypes.c_void_p]
    lib.fg_next.argtypes = [ctypes.c_void_p,
                            ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    lib.fg_next_batch.argtypes = [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_float),
                                  ctypes.c_int, ctypes.c_int]
    lib.fg_frame_index.restype = ctypes.c_uint64
    lib.fg_frame_index.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


class NativeSpriteVideo:
    """C++ frame source with the SpriteVideo interface (not bit-identical
    to the NumPy generator — same statistical model, native RNG)."""

    def __init__(self, cfg: SpriteVideoConfig, n_threads: int = 4):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("libframegen.so unavailable; run "
                               f"`make -C {_NATIVE_DIR}`")
        self._lib = lib
        self.cfg = cfg
        self.n_threads = n_threads
        self._h = lib.fg_create(cfg.height, cfg.width, cfg.channels,
                                cfg.n_sprites, cfg.sprite_size,
                                float(cfg.speed), float(cfg.noise_std),
                                cfg.seed)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.fg_destroy(self._h)
            self._h = None

    def frame(self) -> np.ndarray:
        """NOTE: renders AND advances (unlike SpriteVideo.frame)."""
        out = np.empty((self.cfg.height, self.cfg.width, self.cfg.channels),
                       np.float32)
        self._lib.fg_next(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.n_threads)
        return out

    def clip(self, n: int) -> np.ndarray:
        out = np.empty((n, self.cfg.height, self.cfg.width,
                        self.cfg.channels), np.float32)
        self._lib.fg_next_batch(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n, self.n_threads)
        return out

    def frames(self, n: int) -> Iterator[np.ndarray]:
        for _ in range(n):
            yield self.frame()


class PrefetchingSource:
    """Producer-thread frame pipeline: overlaps host frame production (or
    decode, for real sources) with device compute. Wraps any object with a
    ``frame() -> np.ndarray`` method."""

    def __init__(self, source, depth: int = 4):
        self._source = source
        self._q: "queue.Queue[Optional[np.ndarray]]" = queue.Queue(depth)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    _EOS = object()  # end-of-stream sentinel (finite file sources)

    def _worker(self):
        while not self._stop.is_set():
            try:
                frame = self._source.frame()
            except EOFError:
                frame = self._EOS  # finite source drained -> StopIteration
            while not self._stop.is_set():
                try:
                    self._q.put(frame, timeout=0.1)
                    break
                except queue.Full:
                    continue
            if frame is self._EOS:
                return

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        item = self._q.get()
        if item is self._EOS:
            raise StopIteration
        return item

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=2.0)


def make_video(cfg: SpriteVideoConfig, prefer_native: bool = True):
    """Best-available frame source for a config."""
    if prefer_native and native_available():
        return NativeSpriteVideo(cfg)
    return SpriteVideo(cfg)
