"""Index build + FM oracle correctness against brute-force ground truth."""
import numpy as np
import pytest

from bwamem_tpu.index.build import build_index_from_codes
from bwamem_tpu.index.format import Annotation
from bwamem_tpu.index.suffix_array import _suffix_array_numpy, suffix_array
from bwamem_tpu.oracle.fmd import FMOracle
from bwamem_tpu.utils.dna import revcomp_codes


def brute_suffix_array(s):
    n = len(s)
    suf = sorted(range(n), key=lambda i: tuple(s[i:]))
    return np.array(suf, dtype=np.int64)


def test_suffix_array_small():
    rng = np.random.default_rng(1)
    for n in [1, 2, 5, 17, 100, 333]:
        s = rng.integers(0, 4, n, dtype=np.uint8)
        expect = brute_suffix_array(s)
        np.testing.assert_array_equal(_suffix_array_numpy(s), expect)
        np.testing.assert_array_equal(suffix_array(s), expect)


def test_native_sais_matches_numpy():
    from bwamem_tpu.native import loader

    lib = loader.try_load()
    if lib is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(2)
    for n in [1, 3, 64, 1000, 40000]:
        s = rng.integers(0, 4, n, dtype=np.uint8)
        np.testing.assert_array_equal(
            loader.sais(lib, s), _suffix_array_numpy(s)
        )
    # degenerate runs
    np.testing.assert_array_equal(
        loader.sais(lib, np.zeros(50, dtype=np.uint8)),
        _suffix_array_numpy(np.zeros(50, dtype=np.uint8)),
    )


def _full_sa(T):
    n = len(T)
    sa = suffix_array(T)
    out = np.empty(n + 1, dtype=np.int64)
    out[0] = n
    out[1:] = sa
    return out


def test_occ_and_sa_lookup(tiny_index):
    g, idx = tiny_index
    T = np.concatenate([g, revcomp_codes(g)])
    sa_full = _full_sa(T)
    # reconstruct BWT$ directly
    bwt = np.where(sa_full == 0, 4, T[(sa_full - 1) % len(T)]).astype(np.uint8)
    assert int(np.flatnonzero(bwt == 4)[0]) == idx.primary

    orc = FMOracle(idx)
    rng = np.random.default_rng(3)
    for i in rng.integers(0, len(T) + 1, 50):
        i = int(i)
        expect = np.array(
            [(bwt[:i] == c).sum() for c in range(4)], dtype=np.int64
        )
        np.testing.assert_array_equal(orc.occ4(i), expect)
    for r in rng.integers(0, len(T) + 1, 100):
        assert orc.sa_lookup(int(r)) == sa_full[int(r)]


def brute_smems(T, q, min_len=1):
    """All super-maximal exact matches of q in T (occurrence-checked by
    direct string containment over the doubled text)."""
    n = len(q)
    text = T.tobytes()

    def occurs(b, e):
        return q[b:e].tobytes() in text

    matches = []
    for b in range(n):
        if q[b] >= 4:
            continue
        lo, hi = b, n
        # longest e such that q[b:e] occurs
        e = b
        while e < n and q[e] < 4 and occurs(b, e + 1):
            e += 1
        if e > b:
            matches.append((b, e))
    # keep maximal ones
    out = []
    for b, e in matches:
        contained = any(
            (b2 <= b and e <= e2 and (b2, e2) != (b, e)) for b2, e2 in matches
        )
        if not contained and e - b >= min_len:
            out.append((b, e))
    return sorted(set(out))


def test_smem_oracle_vs_brute(tiny_index):
    g, idx = tiny_index
    T = np.concatenate([g, revcomp_codes(g)])
    orc = FMOracle(idx)
    rng = np.random.default_rng(4)
    for trial in range(20):
        ln = int(rng.integers(15, 60))
        pos = int(rng.integers(0, len(g) - ln))
        q = g[pos : pos + ln].copy()
        nerr = int(rng.integers(0, 3))
        for _ in range(nerr):
            i = int(rng.integers(0, ln))
            q[i] = (q[i] + 1 + rng.integers(0, 3)) % 4
        mems = orc.collect_smems(q, min_seed_len=1)
        got = sorted((m.start, m.end) for m in mems)
        assert got == brute_smems(T, q), f"trial {trial}"
        # interval sizes must equal true occurrence counts
        for m in mems:
            pat = q[m.start : m.end].tobytes()
            count = 0
            start = 0
            tb = T.tobytes()
            while True:
                j = tb.find(pat, start)
                if j < 0:
                    break
                count += 1
                start = j + 1
            assert m.s == count


def test_smem_with_ambiguous_bases(tiny_index):
    g, idx = tiny_index
    orc = FMOracle(idx)
    q = g[100:160].copy()
    q[20] = 4  # N splits the read
    mems = orc.collect_smems(q, min_seed_len=5)
    for m in mems:
        assert not (m.start <= 20 < m.end)
    # left part and right part both seed
    assert any(m.end <= 20 for m in mems)
    assert any(m.start > 20 for m in mems)
