"""ctypes bindings for the native (C++) TFRecord reader in csrc/.

The shared library is built on demand with the toolchain baked into the
image (``make -C csrc``); if unavailable the pure-Python reader in
data/tfrecord.py is the fallback — same framing, same results, just
single-threaded.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libtfrec.so")

_lib = None


def _build_library() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _CSRC, "-s"], check=True, capture_output=True
        )
        return os.path.exists(_LIB_PATH)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def load_library():
    """Load (building if necessary) the native reader. None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build_library():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.tfrec_open.restype = ctypes.c_void_p
    lib.tfrec_open.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.tfrec_next.restype = ctypes.c_int64
    lib.tfrec_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
    ]
    lib.tfrec_close.argtypes = [ctypes.c_void_p]
    lib.tfrec_masked_crc32c.restype = ctypes.c_uint32
    lib.tfrec_masked_crc32c.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return load_library() is not None


class NativeTFRecordReader:
    """Iterator over record payloads, decoded by the C++ thread pool."""

    def __init__(
        self,
        paths: list[str] | str,
        num_threads: int = 4,
        capacity: int = 512,
        verify_crc: bool = False,
        repeat: bool = False,
    ):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native TFRecord reader unavailable (no g++?)")
        if isinstance(paths, str):
            paths = [paths]
        self._lib = lib
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode("utf-8") for p in paths]
        )
        self._handle = lib.tfrec_open(
            arr, len(paths), num_threads, capacity, int(verify_crc), int(repeat)
        )
        self._buf = (ctypes.c_uint8 * (1 << 20))()

    def __iter__(self) -> Iterator[bytes]:
        return self

    def __next__(self) -> bytes:
        n = self._lib.tfrec_next(self._handle, self._buf, len(self._buf))
        if n == 0:
            raise StopIteration
        if n == -2:
            # Zero-length record: valid framing, empty payload — the C++
            # side signals it distinctly so it is not mistaken for
            # end-of-data (which would drop every record after it).
            return b""
        if n < 0:
            needed = -n
            if needed > len(self._buf):  # grow and retry
                self._buf = (ctypes.c_uint8 * (2 * needed))()
                return self.__next__()
            raise IOError("native TFRecord reader error")
        # One C-level copy; slicing the ctypes array materializes n
        # Python ints per record, which dominated the decode at
        # pipeline rates.
        return ctypes.string_at(self._buf, n)

    def close(self):
        if self._handle:
            self._lib.tfrec_close(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
