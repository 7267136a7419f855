"""ctypes bridge to the C++ batch loader + flat binary subset cache format.

A subset (projection_2d + targets + numeric meta) is rendered once into a
single flat ``.bin`` (arrays back to back, C-contiguous) with a JSON sidecar
describing offsets/dtypes/shapes; batches are then assembled by the native
multi-threaded gather straight out of the page cache. Used as the accelerated
path under ``Hdf5DataModule`` batch iteration.
"""
import ctypes
import json
import os
import subprocess
import threading
from typing import Dict, List, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libbatch_loader.so")
_BUILD_LOCK = threading.Lock()
_LIB = None


def _build_library() -> bool:
    src = os.path.join(_NATIVE_DIR, "batch_loader.cpp")
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", _LIB_PATH, src, "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load_library():
    global _LIB
    if _LIB is not None:
        return _LIB
    with _BUILD_LOCK:
        if _LIB is not None:
            return _LIB
        if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH)
                < os.path.getmtime(os.path.join(_NATIVE_DIR,
                                                "batch_loader.cpp"))):
            if not _build_library():
                return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.bl_open.restype = ctypes.c_void_p
        lib.bl_open.argtypes = [ctypes.c_char_p]
        lib.bl_close.argtypes = [ctypes.c_void_p]
        lib.bl_gather.restype = ctypes.c_int
        lib.bl_gather.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int]
        _LIB = lib
    return _LIB


def native_loader_available() -> bool:
    return _load_library() is not None


class BinarySubsetCache:
    """Flat binary cache of named arrays sharing a leading (clip) dim."""

    MAGIC = "pv2c-bin-v1"

    def __init__(self, path: str):
        self.path = path
        with open(path + ".json") as f:
            self.manifest = json.load(f)
        assert self.manifest["magic"] == self.MAGIC
        self._lib = _load_library()
        if self._lib is None:
            raise RuntimeError("native batch loader unavailable "
                               "(g++ build failed)")
        self._handle = self._lib.bl_open(path.encode())
        if not self._handle:
            raise OSError(f"cannot map {path}")
        self.num_clips = self.manifest["num_clips"]
        self.arrays = self.manifest["arrays"]

    @classmethod
    def write(cls, path: str, arrays: Dict[str, np.ndarray]) -> "BinarySubsetCache":
        num_clips = None
        manifest: Dict = {"magic": cls.MAGIC, "arrays": {}}
        offset = 0
        with open(path, "wb") as f:
            for name, arr in arrays.items():
                arr = np.ascontiguousarray(arr)
                if num_clips is None:
                    num_clips = len(arr)
                assert len(arr) == num_clips, name
                manifest["arrays"][name] = {
                    "offset": offset,
                    "dtype": str(arr.dtype),
                    "shape": list(arr.shape[1:]),
                    "row_bytes": int(arr.nbytes // len(arr))
                    if len(arr) else 0,
                }
                f.write(arr.tobytes())
                offset += arr.nbytes
        manifest["num_clips"] = int(num_clips or 0)
        with open(path + ".json", "w") as f:
            json.dump(manifest, f)
        return cls(path)

    def gather(self, indices: Sequence[int],
               names: Optional[List[str]] = None,
               num_threads: Optional[int] = None) -> Dict[str, np.ndarray]:
        """Assemble a batch: ``{name: (len(indices), *shape) array}``.

        The win over in-memory numpy fancy indexing is not raw copy speed
        (both are memcpy-bound) but that the subset stays mmapped — batches
        stream from the page cache without ever materializing the full
        dataset in process memory, and the copy parallelizes across cores.
        """
        if num_threads is None:
            num_threads = min(8, os.cpu_count() or 1)
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        out: Dict[str, np.ndarray] = {}
        for name in (names or self.arrays.keys()):
            info = self.arrays[name]
            arr = np.empty((len(idx),) + tuple(info["shape"]),
                           dtype=np.dtype(info["dtype"]))
            rc = self._lib.bl_gather(
                self._handle,
                ctypes.c_uint64(info["offset"]),
                ctypes.c_uint64(info["row_bytes"]),
                idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                ctypes.c_int64(len(idx)),
                arr.ctypes.data_as(ctypes.c_void_p),
                ctypes.c_int(num_threads))
            if rc != 0:
                raise IndexError(f"native gather failed for {name}")
            out[name] = arr
        return out

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.bl_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
