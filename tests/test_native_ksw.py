"""Native (C++) banded-global kernel vs the Python oracle — bit-exact
scores and CIGARs (the reference's equivalent component is ksw_global2,
src/ksw.c; SURVEY marks the CPU SW kernels ⊕ native)."""
import numpy as np
import pytest

from bwamem_tpu.native import loader
from bwamem_tpu.ops.extend import make_score_matrix
from bwamem_tpu.oracle.ksw import ksw_global


@pytest.fixture(scope="module")
def lib():
    lib = loader.try_load()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_native_ksw_global_matches_oracle(lib):
    mat = make_score_matrix(1, 4)
    rng = np.random.default_rng(0)
    for trial in range(200):
        qlen = int(rng.integers(1, 80))
        tlen = int(rng.integers(1, 80))
        q = rng.integers(0, 5, qlen).astype(np.uint8)
        t = rng.integers(0, 5, tlen).astype(np.uint8)
        if trial % 2:  # related sequences exercise real tracebacks
            t = np.concatenate([t, q, t])[: max(qlen, tlen)]
        w = int(rng.integers(1, 100))
        s1, c1 = ksw_global(q, t, mat, 6, 1, 6, 1, w)
        s2, c2 = loader.ksw_global_native(lib, q, t, mat, 6, 1, 6, 1, w)
        assert s1 == s2, trial
        assert c1 == c2, trial


def test_native_ksw_score_only(lib):
    mat = make_score_matrix(1, 4)
    q = np.array([0, 1, 2, 3] * 10, np.uint8)
    s, c = loader.ksw_global_native(lib, q, q, mat, 6, 1, 6, 1, 20,
                                    want_cigar=False)
    assert s == 40 and c == []


def test_native_ksw_empty_inputs(lib):
    mat = make_score_matrix(1, 4)
    q = np.array([0, 1, 2], np.uint8)
    e = np.empty(0, np.uint8)
    s, c = loader.ksw_global_native(lib, q, e, mat, 6, 1, 6, 1, 10)
    assert c == [(1, 3)]  # all-insertion
    s, c = loader.ksw_global_native(lib, e, q, mat, 6, 1, 6, 1, 10)
    assert c == [(2, 3)]  # all-deletion
