"""ctypes loader for the native (C++) components.

Builds `libbwamem_native.so` from the sources in <repo>/native on first use
(g++ -O3). Native pieces mirror the reference's native runtime components
(SURVEY §2 marks them ⊕): SA-IS index construction here; more (IO packers)
live alongside.
"""
from __future__ import annotations

import ctypes
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

_SOURCES = ["sais.cpp", "ksw.cpp", "fastx.cpp", "chain.cpp"]


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
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.bm_chain_batch.restype = ctypes.c_int64
        lib.bm_chain_batch.argtypes = [
            i32p, i32p, i64p, i64p, i64p, ctypes.c_int64, i32p,
            i64p, ctypes.POINTER(ctypes.c_int8),
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_double, ctypes.c_double, ctypes.c_int32,
            ctypes.c_int64,
            i64p, i32p, i32p, ctypes.c_int64,
            i32p, i32p, i32p, i32p, i64p, i32p,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, i64p,
        ]
        lib.bm_fastx_scan.restype = ctypes.c_int64
        lib.bm_fastx_scan.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.bm_encode_bases.restype = None
        lib.bm_encode_bases.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.bm_ksw_global.restype = ctypes.c_int
        lib.bm_ksw_global.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int8), ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def ksw_global_native(lib, query, target, mat, o_del, e_del, o_ins, e_ins,
                      w, want_cigar=True):
    """Native banded global alignment; mirrors oracle.ksw.ksw_global's
    return contract: (score, [(op, len), ...])."""
    q = np.ascontiguousarray(query, dtype=np.uint8)
    t = np.ascontiguousarray(target, dtype=np.uint8)
    m = np.ascontiguousarray(mat, dtype=np.int8)
    score = ctypes.c_int32()
    n_cigar = ctypes.c_int32()
    cap = len(q) + len(t) + 2
    cig = np.empty(cap, dtype=np.uint32)
    rc = lib.bm_ksw_global(
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(q),
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(t),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), m.shape[0],
        int(o_del), int(e_del), int(o_ins), int(e_ins), int(w),
        ctypes.byref(score),
        cig.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)) if want_cigar
        else None,
        cap, ctypes.byref(n_cigar),
    )
    if rc != 0:
        raise RuntimeError("bm_ksw_global failed")
    cigar = [(int(c & 0xF), int(c >> 4)) for c in cig[: n_cigar.value]]
    return int(score.value), cigar


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
