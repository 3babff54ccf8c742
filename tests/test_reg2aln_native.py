"""Differential tests: native batched reg2aln core vs the scalar Python
twin, and the RG:Z read-group tag plumbing.

The native kernel (native/reg2aln.cpp) must match
samgen._reg2aln_solve_scalar / gen_cigar bit-for-bit (reference:
src/bwamem.c:2344-2438 mem_reg2aln, src/bwa.c:111-217 bwa_gen_cigar2).
"""
import numpy as np
import pytest

from bwamem_tpu.index.build import build_index_from_codes
from bwamem_tpu.index.format import Annotation
from bwamem_tpu.pipeline.options import MemOptions
from bwamem_tpu.pipeline.regions import AlnReg
from bwamem_tpu.pipeline import samgen
from bwamem_tpu.native.loader import try_load


@pytest.fixture(scope="module")
def small_idx():
    rng = np.random.default_rng(7)
    G = 120_000
    g = rng.integers(0, 4, G, dtype=np.uint8)
    idx = build_index_from_codes(
        g, Annotation(names=["r"], lengths=[G], offsets=[0]), sa_intv=8)
    return g, idx


def _mutate(rng, q):
    for _ in range(int(rng.integers(0, 6))):
        i = int(rng.integers(0, len(q)))
        r = rng.random()
        if r < 0.6:
            q[i] = (q[i] + 1 + int(rng.integers(0, 3))) % 4
        elif r < 0.8 and len(q) > 40:
            q = np.delete(q, i)
        else:
            q = np.insert(q, i, int(rng.integers(0, 4)))
    return q


def test_reg2aln_batch_matches_scalar(small_idx):
    if try_load() is None:
        pytest.skip("native toolchain unavailable")
    g, idx = small_idx
    G = len(g)
    rng = np.random.default_rng(11)
    opt = MemOptions()
    items = []
    for _ in range(300):
        L = int(rng.integers(60, 260))
        p = int(rng.integers(0, G - L - 20))
        q = _mutate(rng, g[p:p + L].copy())
        L2 = len(q)
        if bool(rng.integers(0, 2)):
            rb, re = 2 * G - (p + L), 2 * G - p
            q = (3 - q)[::-1]
        else:
            rb, re = p, p + L
        qb = int(rng.integers(0, 5))
        qe = L2 - int(rng.integers(0, 5))
        if qe <= qb:
            continue
        ar = AlnReg(rb=rb, re=re, qb=qb, qe=qe, rid=0, score=L2, truesc=L2,
                    w=opt.w, secondary=-1)
        items.append((L2, q, ar))
    items.append((100, np.zeros(100, np.uint8), None))  # unmapped corner
    exp = [samgen.mem_reg2aln_scalar(opt, idx, lq, q, ar)
           for (lq, q, ar) in items]
    got = samgen.reg2aln_batch(opt, idx, items)
    for e, o in zip(exp, got):
        assert (e.cigar, e.NM, e.md, e.pos, e.rid, e.is_rev, e.flag) == \
               (o.cigar, o.NM, o.md, o.pos, o.rid, o.is_rev, o.flag)


def test_reg2sam_batch_matches_scalar(small_idx):
    """Whole-slice batch emit vs per-read mem_reg2sam (same selection,
    XA assembly, flag interplay; reference: src/bwamem.c:1721-1775)."""
    from bwamem_tpu.pipeline.regions import mem_mark_primary_se
    from bwamem_tpu.index.format import FMIndex
    from bwamem_tpu.pipeline.aligner import MemAligner

    g, idx = small_idx
    G = len(g)
    rng = np.random.default_rng(13)
    al = MemAligner(MemOptions(), idx)
    names, seqs = [], []
    for i in range(64):
        L = 150
        p = int(rng.integers(0, G - L))
        q = g[p:p + L].copy()
        err = rng.random(L) < 0.02
        q[err] = (q[err] + 1) % 4
        if i % 2:
            q = (3 - q)[::-1]
        names.append(f"s{i}")
        seqs.append(q)
    opt = al.opt
    per = al.collect_regs_batch(seqs)
    marked = [mem_mark_primary_se(opt, [r for r in per[b]], b)[0]
              for b in range(len(seqs))]
    exp = []
    for b in range(len(seqs)):
        exp.extend(samgen.mem_reg2sam(opt, idx, names[b], seqs[b], None,
                                      marked[b]))
    got = samgen.mem_reg2sam_batch(opt, idx, names, seqs,
                                   [None] * len(seqs), marked)
    assert exp == got


def test_rg_id_tagging(small_idx):
    g, idx = small_idx
    opt = MemOptions()
    opt.rg_id = "grp7"
    from bwamem_tpu.pipeline.aligner import MemAligner
    al = MemAligner(opt, idx)
    q = g[1000:1150].copy()
    lines = al.align_batch(["r0"], [q])
    assert any("RG:Z:grp7" in ln for ln in lines)


def test_dedup_patch_native_matches_python(small_idx):
    """C++ bm_dedup_patch_batch vs regions.mem_sort_dedup_patch on
    randomized region sets (split/patchable, near-duplicate, unrelated)."""
    from bwamem_tpu.native.loader import dedup_patch_native
    from bwamem_tpu.pipeline.regions import mem_sort_dedup_patch

    if try_load() is None:
        pytest.skip("native toolchain unavailable")
    g, idx = small_idx
    G = len(g)
    opt = MemOptions()
    lib = try_load()
    for trial in range(120):
        tr = np.random.default_rng(trial)
        L = 150
        p0 = int(tr.integers(0, G - L))
        q = g[p0:p0 + L].copy()
        e = tr.random(L) < 0.02
        q[e] = (q[e] + 1) % 4
        regs = []
        for _ in range(int(tr.integers(1, 7))):
            kind = tr.random()
            if kind < 0.5:
                cut = int(tr.integers(30, L - 30))
                d = int(tr.integers(0, 8))
                regs.append((0, cut, p0, p0 + cut,
                             cut - int(tr.integers(0, 10))))
                regs.append((cut + d // 2, L, p0 + cut + d, p0 + L + d,
                             L - cut - int(tr.integers(0, 10))))
            elif kind < 0.8:
                s0 = int(tr.integers(0, 30))
                e0 = L - int(tr.integers(0, 30))
                off = int(tr.integers(-3, 4))
                regs.append((s0, e0, p0 + s0 + off, p0 + e0 + off,
                             e0 - s0 - int(tr.integers(0, 15))))
            else:
                p2 = int(tr.integers(0, G - L))
                s0 = int(tr.integers(0, 40))
                e0 = L - int(tr.integers(0, 40))
                regs.append((s0, e0, p2 + s0, p2 + e0,
                             e0 - s0 - int(tr.integers(0, 20))))
        objs = [AlnReg(rb=rb_, re=re_, qb=qb_, qe=qe_, rid=0,
                       score=max(sc, 1), truesc=max(sc, 1), w=opt.w,
                       seedcov=int(tr.integers(10, 100)))
                for (qb_, qe_, rb_, re_, sc) in regs]
        n = len(objs)
        F = dict(
            rb=np.array([o.rb for o in objs], np.int64),
            re=np.array([o.re for o in objs], np.int64),
            qb=np.array([o.qb for o in objs], np.int32),
            qe=np.array([o.qe for o in objs], np.int32),
            score=np.array([o.score for o in objs], np.int32),
            truesc=np.array([o.truesc for o in objs], np.int32),
            w=np.array([o.w for o in objs], np.int32),
            seedcov=np.array([o.seedcov for o in objs], np.int32),
            sub=np.zeros(n, np.int32), csub=np.zeros(n, np.int32),
            n_comp=np.ones(n, np.int32), rid=np.zeros(n, np.int32))
        exp = mem_sort_dedup_patch(opt, idx, q, list(objs))
        oi, oc = dedup_patch_native(
            lib, opt, idx, np.array([0, n], np.int64),
            np.ascontiguousarray(q, np.uint8), np.array([0], np.int64), F)
        assert int(oc[0]) == len(exp)
        for j, ex in enumerate(exp):
            k = int(oi[j])
            assert (int(F["score"][k]), int(F["rb"][k]), int(F["re"][k]),
                    int(F["qb"][k]), int(F["qe"][k]),
                    int(F["n_comp"][k]), int(F["seedcov"][k]),
                    int(F["w"][k])) == (ex.score, ex.rb, ex.re, ex.qb,
                                        ex.qe, ex.n_comp, ex.seedcov,
                                        ex.w)
