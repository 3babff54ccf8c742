"""ctypes loader for the native (C++) components.

Builds `libbwamem_native.so` from the sources in <repo>/native on first use
(g++ -O3). Native pieces mirror the reference's native runtime components
(SURVEY §2 marks them ⊕): SA-IS index construction here; more (IO packers)
live alongside.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC_DIR = _REPO_ROOT / "native"
_BUILD_DIR = Path(__file__).resolve().parent / "_build"
_LIB_PATH = _BUILD_DIR / "libbwamem_native.so"

_lock = threading.Lock()
_lib = None
_load_failed = False

_SOURCES = ["sais.cpp", "fastx.cpp"]


def _build() -> bool:
    srcs = [str(_SRC_DIR / s) for s in _SOURCES if (_SRC_DIR / s).exists()]
    if not srcs:
        return False
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    # rebuild when any source is newer than the lib
    if _LIB_PATH.exists():
        lib_mtime = _LIB_PATH.stat().st_mtime
        if all(Path(s).stat().st_mtime <= lib_mtime for s in srcs):
            return True
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-o", str(_LIB_PATH), *srcs,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired):
        return False
    return True


def try_load():
    """Return the loaded CDLL or None if native build is unavailable."""
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed:
        return None
    with _lock:
        if _lib is not None:
            return _lib
        if not _build():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            _load_failed = True
            return None
        lib.bm_sais_u8.restype = ctypes.c_int
        lib.bm_sais_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def sais(lib, codes: np.ndarray) -> np.ndarray:
    s = np.ascontiguousarray(codes, dtype=np.uint8)
    n = len(s)
    sa = np.empty(n, dtype=np.int64)
    k = int(s.max()) + 1 if n else 1
    rc = lib.bm_sais_u8(
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        k,
    )
    if rc != 0:
        raise RuntimeError("bm_sais_u8 failed")
    return sa
