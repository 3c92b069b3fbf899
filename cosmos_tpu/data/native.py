"""ctypes bindings for the tario native data-path library.

See native/tario.cpp: threaded tar streaming + DCT-scaled JPEG decode.
Falls back cleanly (HAS_NATIVE=False) when the .so hasn't been built —
the pure-Python pipeline in webdataset.py remains the reference path.

Build: sh native/build.sh  (auto-attempted on first import).
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Dict, Iterator, Optional

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libtario.so"

_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        build = _NATIVE_DIR / "build.sh"
        if build.exists():
            # serialize the auto-build across concurrent loader workers
            # (flock) and land the .so atomically (temp + rename): a
            # sibling must never dlopen a partially written library
            import fcntl
            import os

            try:
                with open(_NATIVE_DIR / ".tario.build.lock", "w") as lk:
                    fcntl.flock(lk, fcntl.LOCK_EX)
                    if not _LIB_PATH.exists():  # re-check under the lock
                        tmp = _NATIVE_DIR / f".libtario.{os.getpid()}.so"
                        subprocess.run(
                            ["sh", str(build), str(tmp)],
                            check=True, capture_output=True,
                        )
                        os.replace(tmp, _LIB_PATH)
            except subprocess.CalledProcessError as e:
                logger.warning(f"tario build failed: {e.stderr.decode()[:300]}")
                return None
            except OSError as e:  # read-only install dir, etc.
                logger.warning(f"tario build unavailable: {e!r}")
                return None
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.tario_decode_jpeg.restype = ctypes.POINTER(ctypes.c_ubyte)
    lib.tario_decode_jpeg.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.tario_jpeg_dims.restype = ctypes.c_int
    lib.tario_jpeg_dims.argtypes = [
        ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.tario_free.argtypes = [ctypes.c_void_p]
    lib.tario_open.restype = ctypes.c_void_p
    lib.tario_open.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int
    ]
    lib.tario_next.restype = ctypes.c_void_p
    lib.tario_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int)]
    lib.tario_member.restype = ctypes.POINTER(ctypes.c_ubyte)
    lib.tario_member.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_long),
    ]
    lib.tario_sample_key.restype = ctypes.c_char_p
    lib.tario_sample_key.argtypes = [ctypes.c_void_p]
    lib.tario_release_sample.argtypes = [ctypes.c_void_p]
    lib.tario_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def decode_jpeg_scaled(
    data: bytes, min_size: Optional[int] = None
) -> Optional[np.ndarray]:
    """Decode JPEG to an RGB uint8 array [H, W, 3].

    With ``min_size``, picks the largest DCT scale_denom in {8,4,2,1}
    whose output short side still >= min_size — decoding a 2000px photo
    destined for a 224px crop at 1/8 scale is ~10x cheaper.
    """
    lib = _load()
    if lib is None:
        return None
    denom = 1
    if min_size is not None:
        w = ctypes.c_int()
        h = ctypes.c_int()
        if lib.tario_jpeg_dims(data, len(data), ctypes.byref(w),
                               ctypes.byref(h)) == 0:
            short = min(w.value, h.value)
            for d in (8, 4, 2):
                if short // d >= min_size:
                    denom = d
                    break
    w = ctypes.c_int()
    h = ctypes.c_int()
    ptr = lib.tario_decode_jpeg(data, len(data), denom,
                                ctypes.byref(w), ctypes.byref(h))
    if not ptr:
        return None
    n = w.value * h.value * 3
    arr = np.ctypeslib.as_array(ptr, shape=(h.value, w.value, 3)).copy()
    lib.tario_free(ptr)
    return arr


class NativeTarStream:
    """Iterator over {ext: bytes} samples from tar shards, prefetched by a
    native background thread."""

    def __init__(self, paths, capacity: int = 64):
        lib = _load()
        if lib is None:
            raise RuntimeError("libtario.so unavailable")
        self._lib = lib
        arr = (ctypes.c_char_p * len(paths))(
            *[str(p).encode() for p in paths]
        )
        self._handle = lib.tario_open(arr, len(paths), capacity)

    def __iter__(self) -> Iterator[Dict[str, bytes]]:
        lib = self._lib
        while True:
            n = ctypes.c_int()
            s = lib.tario_next(self._handle, ctypes.byref(n))
            if not s:
                return
            sample: Dict[str, bytes] = {
                "__key__": lib.tario_sample_key(s)
            }
            for i in range(n.value):
                ext = ctypes.c_char_p()
                ln = ctypes.c_long()
                ptr = lib.tario_member(s, i, ctypes.byref(ext), ctypes.byref(ln))
                sample[ext.value.decode()] = ctypes.string_at(ptr, ln.value)
            lib.tario_release_sample(s)
            yield sample

    def close(self):
        if self._handle:
            self._lib.tario_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
