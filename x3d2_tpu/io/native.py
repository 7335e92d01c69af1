"""ctypes bindings for the native C++ IO runtime (native/x3d2io.cpp).

Compiles the shared library on first use (g++, cached next to the source)
and exposes: strided float32 packing, VTK base64 encoding, and the
background atomic-rename file writer. Every entry point has a pure-Python
fallback so the framework runs without a toolchain.
"""

from __future__ import annotations

import base64
import ctypes
import os
import struct
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_HERE, "native", "x3d2io.cpp")
_LIB = os.path.join(_HERE, "native", "libx3d2io.so")

_lib = None
_lib_tried = False


def _build():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
           "-o", _LIB, _SRC, "-lpthread"]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB)
        i64 = ctypes.c_int64
        lib.pack_strided_f32_from_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p] + [i64] * 8
        lib.pack_strided_f32_from_f64.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p] + [i64] * 8
        lib.vtk_base64_encode.argtypes = [ctypes.c_void_p, i64,
                                          ctypes.c_void_p]
        lib.vtk_base64_encode.restype = i64
        lib.async_write.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                    ctypes.c_void_p, i64]
        lib.async_pending.restype = i64
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def pack_strided(arr: np.ndarray, stride) -> np.ndarray:
    """Strided downcast to float32 (native when available)."""
    sx, sy, sz = (max(1, int(s)) for s in stride)
    lib = get_lib()
    arr = np.ascontiguousarray(arr)
    if lib is not None and arr.dtype in (np.float32, np.float64):
        nx, ny, nz = arr.shape
        out = np.empty(((nx + sx - 1) // sx, (ny + sy - 1) // sy,
                        (nz + sz - 1) // sz), np.float32)
        fn = (lib.pack_strided_f32_from_f32 if arr.dtype == np.float32
              else lib.pack_strided_f32_from_f64)
        fn(arr.ctypes.data, out.ctypes.data, nx, ny, nz, sx, sy, sz,
           ny * nz, nz)
        return out
    return np.asarray(arr[::sx, ::sy, ::sz], np.float32)


def vtk_b64(data: np.ndarray) -> str:
    """VTK appended-payload base64 (uint32 length header + raw data)."""
    raw = np.ascontiguousarray(data).tobytes()
    lib = get_lib()
    if lib is not None:
        n = len(raw)
        out = ctypes.create_string_buffer(4 * ((n + 4 + 2) // 3) + 8)
        m = lib.vtk_base64_encode(raw, n, out)
        return out.raw[:m].decode()
    return base64.b64encode(struct.pack("<I", len(raw)) + raw).decode()


_py_async_lock = threading.Lock()
_py_async_threads = []


def async_write(path: str, data: bytes):
    """Write bytes to path atomically (tmp + rename) off the main thread."""
    tmp = path + ".tmp"
    lib = get_lib()
    if lib is not None:
        lib.async_write(tmp.encode(), path.encode(), data, len(data))
        return

    def run():
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.replace(tmp, path)

    t = threading.Thread(target=run, daemon=True)
    with _py_async_lock:
        _py_async_threads.append(t)
    t.start()


def async_flush():
    lib = get_lib()
    if lib is not None:
        lib.async_flush()
        return
    with _py_async_lock:
        threads = list(_py_async_threads)
        _py_async_threads.clear()
    for t in threads:
        t.join()
