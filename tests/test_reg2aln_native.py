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
