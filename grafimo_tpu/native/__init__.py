"""Native (C++) engine loader.

The C++ sources in this directory are compiled on demand with ``g++ -O3``
into a shared library cached next to the sources, then bound with ``ctypes``
(pybind11 is unavailable in this environment; the ABI is a thin ``extern
"C"`` surface over numpy buffers).

Set ``GRAFIMO_TPU_NO_NATIVE=1`` to force the pure-python fallbacks.
"""

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "graphite.cpp")
_LOCK = threading.Lock()
_LIB = None
_LIB_ERR = None


def _build_lib() -> ctypes.CDLL:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    build_dir = os.path.join(_HERE, "_build")
    os.makedirs(build_dir, exist_ok=True)
    so_path = os.path.join(build_dir, f"graphite_{digest}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".tmp.{os.getpid()}"
        cmd = [
            "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
            _SRC, "-o", tmp,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except subprocess.CalledProcessError as e:  # pragma: no cover
            raise RuntimeError(
                f"native build failed: {e.stderr.decode(errors='replace')}"
            ) from e
        os.replace(tmp, so_path)
    return ctypes.CDLL(so_path)


def _lib() -> ctypes.CDLL:
    global _LIB, _LIB_ERR
    if _LIB is not None:
        return _LIB
    if _LIB_ERR is not None:
        raise _LIB_ERR
    if os.environ.get("GRAFIMO_TPU_NO_NATIVE"):
        _LIB_ERR = RuntimeError("native disabled via GRAFIMO_TPU_NO_NATIVE")
        raise _LIB_ERR
    with _LOCK:
        if _LIB is None:
            try:
                lib = _build_lib()
            except Exception as e:  # pragma: no cover
                _LIB_ERR = e
                raise
            lib.seq_tail_sums.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.seq_tail_sums.restype = None
            _LIB = lib
    return _LIB


def seq_tail_sums(arr: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Strict left-to-right tail sums ``out[i] = sum(arr[starts[i]:])``."""
    lib = _lib()
    arr = np.ascontiguousarray(arr, dtype=np.float64)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    out = np.empty(len(starts), dtype=np.float64)
    lib.seq_tail_sums(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(arr.size),
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(starts.size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out
