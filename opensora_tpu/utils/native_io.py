"""Native async checkpoint writer (ctypes binding for csrc/async_writer.cpp).

TPU-host replacement for the reference's TensorNVMe ``AsyncFileWriter``
(reference opensora/utils/ckpt.py:19,335-458): checkpoint bytes are handed to
a C++ background thread so the train loop never blocks on disk; ``flush``
fences before the next save (the reference's ``_sync_io``).

The shared library builds on first use with g++; a threaded pure-Python
writer is the fallback when no compiler is available.
``save_safetensors_async`` exports a pytree in safetensors layout for
interop with the reference's published-checkpoint format.
"""

from __future__ import annotations

import ctypes
import json
import os
import queue
import struct
import subprocess
import threading
from typing import Dict

import numpy as np

_LIB = None
_LIB_FAILED = False


def _lib_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(root, "csrc", "libasync_writer.so")


def _src_path() -> str:
    return _lib_path().replace("libasync_writer.so", "async_writer.cpp")


def _load_lib():
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    path = _lib_path()
    try:
        if not os.path.exists(path) or os.path.getmtime(path) < os.path.getmtime(_src_path()):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", path, _src_path(), "-lpthread"],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(path)
        lib.aw_create.restype = ctypes.c_void_p
        lib.aw_create.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.aw_submit.restype = ctypes.c_int
        lib.aw_submit.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64,
        ]
        lib.aw_flush.restype = ctypes.c_int
        lib.aw_flush.argtypes = [ctypes.c_void_p]
        lib.aw_pending.restype = ctypes.c_uint64
        lib.aw_pending.argtypes = [ctypes.c_void_p]
        lib.aw_destroy.argtypes = [ctypes.c_void_p]
        _LIB = lib
    except Exception:
        _LIB_FAILED = True
    return _LIB


class AsyncFileWriter:
    """Background-thread file writer; native C++ when available."""

    def __init__(self, path: str, max_queue_bytes: int = 1 << 30):
        self.path = path
        lib = _load_lib()
        self._lib = lib
        self._handle = None
        if lib is not None:
            self._handle = lib.aw_create(path.encode(), max_queue_bytes)
        if self._handle is None:
            # pure-python fallback
            self._fd = open(path, "wb")
            self._q: "queue.Queue" = queue.Queue(maxsize=64)
            self._thread = threading.Thread(target=self._run, daemon=True)
            self._thread.start()

    @property
    def native(self) -> bool:
        return self._handle is not None

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                self._q.task_done()
                break
            data, offset = item
            self._fd.seek(offset)
            self._fd.write(data)
            self._q.task_done()

    def write(self, data: bytes, offset: int):
        if self._handle is not None:
            buf = (ctypes.c_char * len(data)).from_buffer_copy(data)
            rc = self._lib.aw_submit(self._handle, buf, len(data), offset)
            if rc != 0:
                raise IOError(f"async write failed for {self.path}")
        else:
            self._q.put((bytes(data), offset))

    def write_array(self, arr: np.ndarray, offset: int):
        arr = np.ascontiguousarray(arr)
        if self._handle is not None:
            rc = self._lib.aw_submit(
                self._handle,
                arr.ctypes.data_as(ctypes.c_void_p),
                arr.nbytes,
                offset,
            )
            if rc != 0:
                raise IOError(f"async write failed for {self.path}")
        else:
            self._q.put((arr.tobytes(), offset))

    def flush(self):
        if self._handle is not None:
            if self._lib.aw_flush(self._handle) != 0:
                raise IOError(f"flush failed for {self.path}")
        else:
            self._q.join()
            self._fd.flush()
            os.fsync(self._fd.fileno())

    def close(self):
        if self._handle is not None:
            self._lib.aw_flush(self._handle)
            self._lib.aw_destroy(self._handle)
            self._handle = None
        else:
            self._q.put(None)
            self._thread.join()
            self._fd.flush()
            os.fsync(self._fd.fileno())
            self._fd.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


_DTYPE_MAP = {
    np.dtype(np.float32): "F32",
    np.dtype(np.float16): "F16",
    np.dtype(np.int32): "I32",
    np.dtype(np.int64): "I64",
    np.dtype(np.uint8): "U8",
}


def _st_dtype(arr: np.ndarray) -> str:
    if str(arr.dtype) == "bfloat16":
        return "BF16"
    return _DTYPE_MAP[arr.dtype]


def save_safetensors_async(tensors: Dict[str, np.ndarray], path: str) -> None:
    """Write a safetensors file through the async writer (publish-format
    export; the reference async-saves EMA shards the same way)."""
    header = {}
    offset = 0
    arrays = {}
    for name in sorted(tensors):
        arr = np.ascontiguousarray(tensors[name])
        arrays[name] = arr
        header[name] = {
            "dtype": _st_dtype(arr),
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + arr.nbytes],
        }
        offset += arr.nbytes
    hbytes = json.dumps(header, separators=(",", ":")).encode()
    pad = (8 - (len(hbytes) % 8)) % 8
    hbytes += b" " * pad

    with AsyncFileWriter(path) as w:
        w.write(struct.pack("<Q", len(hbytes)), 0)
        w.write(hbytes, 8)
        base = 8 + len(hbytes)
        for name in sorted(arrays):
            meta = header[name]
            w.write_array(arrays[name], base + meta["data_offsets"][0])
        w.flush()
