"""Native (C++) chaining core vs the Python implementation — identical
chains on random batches (reference semantics: src/bwamem.c:404-559)."""
import numpy as np
import pytest

from bwamem_tpu.index.build import build_index_from_codes
from bwamem_tpu.index.format import Annotation
from bwamem_tpu.native import loader
from bwamem_tpu.pipeline.chain import chain_batch, mem_chain, mem_chain_flt
from bwamem_tpu.pipeline.options import MemOptions


@pytest.fixture(scope="module")
def env():
    rng = np.random.default_rng(41)
    g = rng.integers(0, 4, 40000, dtype=np.uint8)
    ann = Annotation(names=["a", "b"], lengths=[25000, 15000],
                     offsets=[0, 25000])
    idx = build_index_from_codes(g, ann, sa_intv=8)
    if loader.try_load() is None:
        pytest.skip("native toolchain unavailable")
    return g, idx


def _chains_sig(chains):
    return [
        (c.rid, c.w, c.kept, round(c.frac_rep, 9),
         tuple((s.qbeg, s.rbeg, s.len) for s in c.seeds))
        for c in chains
    ]


def test_native_chain_matches_python(env):
    g, idx = env
    from bwamem_tpu.pipeline.aligner import MemAligner

    rng = np.random.default_rng(2)
    al = MemAligner(MemOptions(), idx)
    names, seqs = [], []
    for i in range(80):
        ln = int(rng.integers(60, 200))
        p = int(rng.integers(0, 40000 - ln))
        r = g[p : p + ln].copy()
        for _ in range(int(rng.integers(0, 8))):
            r[int(rng.integers(0, ln))] = int(rng.integers(0, 5))  # incl N
        if i % 2:
            r = np.where(r < 4, 3 - r, 4).astype(r.dtype)[::-1]
        seqs.append(r)
    seeds = al.seed_batch(seqs)
    lqs = [len(s) for s in seqs]
    opt = al.opt

    native = chain_batch(opt, idx, lqs, seeds)
    for b in range(len(seqs)):
        py = mem_chain_flt(opt, mem_chain(opt, idx, lqs[b], seeds[b]))
        assert _chains_sig(native[b]) == _chains_sig(py), b


def test_native_chain_empty_and_short(env):
    g, idx = env
    opt = MemOptions()
    out = chain_batch(opt, idx, [10, 150], [[], []])
    assert out == [[], []]


def test_chain2aln_fast_path_matches_object_path(env):
    """The native chain2aln fast path must emit byte-identical SAM to the
    Python object path on mixed random batches."""
    from unittest import mock

    from bwamem_tpu.pipeline.aligner import MemAligner

    g, idx = env
    rng = np.random.default_rng(9)
    names, seqs = [], []
    for i in range(120):
        ln = int(rng.integers(40, 260))
        p = int(rng.integers(0, 40000 - ln))
        r = g[p : p + ln].copy()
        for _ in range(int(rng.integers(0, 10))):
            r[int(rng.integers(0, ln))] = int(rng.integers(0, 5))
        if i % 3 == 0:  # chimeric
            p2 = int(rng.integers(0, 40000 - ln))
            r[ln // 2:] = g[p2 + ln // 2 : p2 + ln]
        if i % 2:
            r = np.where(r < 4, 3 - r, 4).astype(r.dtype)[::-1]
        names.append(f"d{i}")
        seqs.append(r)

    al = MemAligner(MemOptions(), idx)
    fast = al.align_batch(names, seqs)

    al2 = MemAligner(MemOptions(), idx)
    with mock.patch.object(MemAligner, "_collect_native",
                           lambda self, s, e: None):
        slow = al2.align_batch(names, seqs)
    assert fast == slow


def test_chain2aln_fast_path_pe_differential(env):
    """PE pipeline through the fast path == object path (pairing consumes
    collect_regs_batch output, so rescue + finalize must see identical
    regions)."""
    from unittest import mock

    from bwamem_tpu.pipeline.aligner import MemAligner

    g, idx = env
    rng = np.random.default_rng(12)
    names, seqs = [], []
    for i in range(25):
        isize = int(rng.normal(350, 30))
        isize = max(220, isize)
        p = int(rng.integers(0, 25000 - isize - 1))
        r1 = g[p : p + 100].copy()
        r2 = np.where(g[p + isize - 100 : p + isize] < 4,
                      3 - g[p + isize - 100 : p + isize], 4)[::-1].copy()
        if i % 6 == 0:
            for j in range(0, 100, 11):
                r2[j] = (r2[j] + 1) % 4  # force rescue
        names += [f"q{i}", f"q{i}"]
        seqs += [r1, r2]
    fast = MemAligner(MemOptions(), idx).align_pairs_batch(names, seqs)
    with mock.patch.object(MemAligner, "_collect_native",
                           lambda self, s, e: None):
        slow = MemAligner(MemOptions(), idx).align_pairs_batch(names, seqs)
    assert fast == slow


def test_fast_path_shd_filter_differential(env):
    """-F (SHD seed filter) now runs ON the native fast path via
    filter_seed_arrays — SAM must stay byte-identical to the per-seed
    object path (SeedFilterBatch)."""
    from unittest import mock

    from bwamem_tpu.pipeline.aligner import MemAligner

    g, idx = env
    rng = np.random.default_rng(21)
    names, seqs = [], []
    for i in range(60):
        ln = int(rng.integers(60, 220))
        p = int(rng.integers(0, 40000 - ln))
        r = g[p : p + ln].copy()
        for _ in range(int(rng.integers(0, 8))):
            r[int(rng.integers(0, ln))] = int(rng.integers(0, 4))
        if i % 2:
            r = (3 - r)[::-1].copy()
        names.append(f"f{i}")
        seqs.append(r)
    opt = MemOptions(shd_filter=True)
    al = MemAligner(opt, idx)
    fast = al.align_batch(names, seqs)
    al2 = MemAligner(MemOptions(shd_filter=True), idx)
    with mock.patch.object(MemAligner, "_collect_native",
                           lambda self, s, e: None):
        slow = al2.align_batch(names, seqs)
    assert fast == slow


def test_fast_path_longread_sw_filter_differential(env):
    """Long reads (>=500 bp, SW seed filter active) stay on the native
    fast path and match the object path byte for byte."""
    from unittest import mock

    from bwamem_tpu.pipeline.aligner import MemAligner

    g, idx = env
    rng = np.random.default_rng(23)
    names, seqs = [], []
    for i in range(12):
        ln = int(rng.integers(550, 900))
        p = int(rng.integers(0, 40000 - ln))
        r = g[p : p + ln].copy()
        for _ in range(int(rng.integers(4, 24))):
            r[int(rng.integers(0, ln))] = int(rng.integers(0, 4))
        if i % 4 == 1:  # chimeric half, stresses chain filtering
            p2 = int(rng.integers(0, 40000 - ln))
            r[ln // 2:] = g[p2 + ln // 2 : p2 + ln]
        if i % 2:
            r = (3 - r)[::-1].copy()
        names.append(f"L{i}")
        seqs.append(r)
    al = MemAligner(MemOptions(), idx)
    fast = al.align_batch(names, seqs)
    al2 = MemAligner(MemOptions(), idx)
    with mock.patch.object(MemAligner, "_collect_native",
                           lambda self, s, e: None):
        slow = al2.align_batch(names, seqs)
    assert fast == slow
