"""Seed pre-filter tests: SHD op semantics, SW filter activation rule, and
end-to-end -F runs (reference: src/bwamem.c:809-990,
src/vector_filter.cpp bit_vec_filter_sse1)."""
import numpy as np
import pytest

from bwamem_tpu.index.build import build_index_from_codes
from bwamem_tpu.index.format import Annotation
from bwamem_tpu.pipeline.aligner import MemAligner
from bwamem_tpu.pipeline.options import MemOptions


def _shd(read, ref, max_error=7):
    import jax.numpy as jnp

    from bwamem_tpu.ops.shd import shd_filter_batch

    n = min(len(read), len(ref))
    R = np.zeros((1, 128), np.int32)
    F = np.zeros((1, 128), np.int32)
    R[0, :n] = read[:n]
    F[0, :n] = ref[:n]
    return bool(np.asarray(shd_filter_batch(
        jnp.asarray(R), jnp.asarray(F),
        jnp.asarray(np.array([n], np.int32)), max_error))[0])


def test_shd_accepts_identical_and_few_subs():
    rng = np.random.default_rng(0)
    s = rng.integers(0, 4, 128).astype(np.int32)
    assert _shd(s, s)
    t = s.copy()
    for j in (10, 50, 90):
        t[j] = (t[j] + 1) % 4
    assert _shd(s, t)  # 3 substitutions <= 7


def test_shd_rejects_garbage():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 4, 128).astype(np.int32)
    b = rng.integers(0, 4, 128).astype(np.int32)
    assert not _shd(a, b)  # unrelated sequences: ~96 expected mismatches


def test_shd_accepts_small_indel():
    """An indel shifts the tail; the shifted XOR terms absorb it."""
    rng = np.random.default_rng(2)
    s = rng.integers(0, 4, 128).astype(np.int32)
    t = np.concatenate([s[:40], s[43:], rng.integers(0, 4, 3)]).astype(
        np.int32)  # 3bp deletion at 40
    assert _shd(s, t)


def test_shd_rejects_many_scattered_errors():
    rng = np.random.default_rng(3)
    s = rng.integers(0, 4, 128).astype(np.int32)
    t = s.copy()
    for j in range(0, 128, 6):  # ~21 substitutions
        t[j] = (t[j] + 1) % 4
    assert not _shd(s, t)


@pytest.fixture(scope="module")
def sim():
    rng = np.random.default_rng(5)
    g = rng.integers(0, 4, 30000, dtype=np.uint8)
    ann = Annotation(names=["c"], lengths=[30000], offsets=[0])
    idx = build_index_from_codes(g, ann, sa_intv=8)
    return g, idx


def _reads(g, n=40, ln=150, seed=0):
    rng = np.random.default_rng(seed)
    names, seqs, truth = [], [], []
    for i in range(n):
        p = int(rng.integers(0, len(g) - ln))
        r = g[p : p + ln].copy()
        for _ in range(2):
            j = int(rng.integers(0, ln))
            r[j] = (r[j] + 1) % 4
        if i % 2:
            r = (3 - r)[::-1]
        names.append(f"r{i}")
        seqs.append(r)
        truth.append((p, bool(i % 2)))
    return names, seqs, truth


def test_shd_filter_end_to_end(sim):
    """-F must not lose true alignments of well-behaved reads."""
    g, idx = sim
    names, seqs, truth = _reads(g)
    al = MemAligner(MemOptions(shd_filter=True), idx)
    lines = al.align_batch(names, seqs)
    prim = {l.split("\t")[0]: l.split("\t") for l in lines
            if not int(l.split("\t")[1]) & 0x904}
    ok = sum(1 for i, (p, rev) in enumerate(truth)
             if abs(int(prim[f"r{i}"][3]) - 1 - p) <= 5)
    assert ok >= 38


def test_sw_filter_rescores_untested_seeds_with_a(sim):
    """Untested seeds of a filtered read (len >= MEM_SHORT_LEN, i.e.
    mem_seed_sw returns -1) are rescored to len * opt.a so they sort on
    the same scale as SW-scored seeds (reference src/bwamem.c:984);
    seeds of reads the filter skips keep their creation score = len."""
    from bwamem_tpu.pipeline.options import MEM_SHORT_LEN
    from bwamem_tpu.pipeline.seedflt import filter_seed_arrays

    g, idx = sim
    opt = MemOptions(a=2, b=8, o_del=12, e_del=2, o_ins=12, e_ins=2)
    long_read = g[:1000].copy()          # filter active (5.5*ln(l) < .05*l)
    short_read = g[2000:2150].copy()     # filter inactive
    raw = {
        "n_chains": 2, "n_seeds": 2,
        "c_read": np.array([0, 1], np.int32),
        "c_soff": np.array([0, 1], np.int64),
        "c_ns": np.array([1, 1], np.int32),
        "c_rid": np.zeros(2, np.int32),
        "c_w": np.array([MEM_SHORT_LEN, 40], np.int32),
        "c_kept": np.zeros(2, np.int32),
        "c_frac": np.zeros(2, np.float32),
        "s_qbeg": np.array([0, 0], np.int32),
        "s_rbeg": np.array([0, 2000], np.int64),
        "s_len": np.array([MEM_SHORT_LEN, 40], np.int32),
    }
    filter_seed_arrays(opt, idx, raw, [long_read, short_read])
    assert raw["n_seeds"] == 2
    assert raw["s_score"][0] == MEM_SHORT_LEN * opt.a  # rescored
    assert raw["s_score"][1] == 40                     # untouched


def test_sw_filter_activates_on_long_reads(sim):
    """mem_flt_chained_seeds is a no-op for 150bp reads and active for
    1000bp reads (reference threshold: 5.5*log(l) vs 0.05*l)."""
    import math

    from bwamem_tpu.pipeline.options import MEM_MINSC_COEF, MEM_SEEDSW_COEF

    assert MEM_MINSC_COEF * math.log(150) > MEM_SEEDSW_COEF * 150   # off
    assert MEM_MINSC_COEF * math.log(1000) < MEM_SEEDSW_COEF * 1000  # on
    g, idx = sim
    rng = np.random.default_rng(9)
    names, seqs = [], []
    for i in range(6):
        p = int(rng.integers(0, len(g) - 1100))
        r = g[p : p + 1000].copy()
        for _ in range(10):
            j = int(rng.integers(0, 1000))
            r[j] = (r[j] + 1) % 4
        names.append(f"L{i}")
        seqs.append(r)
    al = MemAligner(MemOptions(), idx)
    lines = al.align_batch(names, seqs)
    prim = {l.split("\t")[0]: l for l in lines
            if not int(l.split("\t")[1]) & 0x900}
    assert len(prim) == 6
    assert all(not int(l.split("\t")[1]) & 4 for l in prim.values())
