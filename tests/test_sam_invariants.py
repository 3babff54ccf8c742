"""SAM structural invariants across option combinations.

Validates, for every emitted record: CIGAR query-length arithmetic,
NM == mismatches(MD) + indel bases, position bounds, flag consistency,
and PE mate-field reciprocity — the contracts a downstream consumer
(samtools, picard) depends on (reference behavior: src/bwamem.c
mem_aln2sam, src/bwamem_pair.c mem_sam_pe).
"""
import re

import numpy as np
import pytest

from bwamem_tpu.index.build import build_index_from_codes
from bwamem_tpu.index.format import Annotation
from bwamem_tpu.pipeline.aligner import MemAligner
from bwamem_tpu.pipeline.options import MemOptions, MEM_F_PE

_CIG = re.compile(r"(\d+)([MIDSH])")


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(31)
    G = 300_000
    g = rng.integers(0, 4, G, dtype=np.uint8)
    idx = build_index_from_codes(
        g, Annotation(names=["c1", "c2"], lengths=[G // 2, G - G // 2],
                      offsets=[0, G // 2]), sa_intv=8)
    return g, idx


def _reads(g, rng, n, L=150):
    G = len(g)
    names, seqs = [], []
    for i in range(n):
        p = int(rng.integers(0, G - L - 10))
        if i % 4 == 3:
            r = g[p:p + L + 4].copy()
            cut = int(rng.integers(30, L - 30))
            r = np.delete(r, slice(cut, cut + 4))[:L]
        else:
            r = g[p:p + L].copy()
        e = rng.random(len(r)) < 0.02
        r[e] = (r[e] + 1) % 4
        if i % 2:
            r = (3 - r)[::-1]
        names.append(f"q{i}")
        seqs.append(r)
    return names, seqs


def _check_record(ln, idx):
    f = ln.split("\t")
    assert len(f) >= 11, ln
    flag = int(f[1])
    if flag & 0x4:
        return
    rid = [i for i, n in enumerate(idx.ann.names) if n == f[2]]
    assert rid, f"unknown rname {f[2]}"
    pos = int(f[3]) - 1
    cig = f[5]
    ops = _CIG.findall(cig)
    assert "".join(f"{n}{o}" for n, o in ops) == cig, cig
    qlen = sum(int(n) for n, o in ops if o in "MIS")
    rlen = sum(int(n) for n, o in ops if o in "MD")
    assert 0 <= pos and pos + rlen <= idx.ann.lengths[rid[0]], ln
    if f[9] != "*":
        assert qlen == len(f[9]), (cig, len(f[9]))
    tags = {t.split(":", 1)[0]: t.split(":", 2)[2] for t in f[11:]}
    if "MD" in tags and "NM" in tags:
        md = tags["MD"]
        md_mm = len(re.findall(r"[ACGTN]", re.sub(r"\^[ACGTN]+", "", md)))
        dels = sum(len(x) - 1 for x in re.findall(r"\^[ACGTN]+", md))
        ins = sum(int(n) for n, o in ops if o == "I")
        assert md_mm + dels + ins == int(tags["NM"]), (md, tags["NM"])
        # MD run lengths must cover exactly the aligned reference span
        md_ref = sum(int(x) for x in re.findall(r"\d+", md)) + md_mm + dels
        assert md_ref == rlen, (md, cig)


@pytest.mark.parametrize("kw", [
    {},
    {"a": 2},
    {"T": 20, "max_XA_hits": 2},
    {"flag_all": True},
])
def test_se_invariants(world, kw):
    g, idx = world
    opt = MemOptions()
    if kw.pop("flag_all", False):
        from bwamem_tpu.pipeline.options import MEM_F_ALL
        opt.flag |= MEM_F_ALL
    for k, v in kw.items():
        setattr(opt, k, v)
    if opt.a != 1:
        opt.scale_for_a()
    al = MemAligner(opt, idx)
    names, seqs = _reads(g, np.random.default_rng(7), 96)
    for ln in al.align_batch(names, seqs):
        _check_record(ln, idx)


def test_pe_invariants(world):
    g, idx = world
    G = len(g)
    opt = MemOptions()
    opt.flag |= MEM_F_PE
    al = MemAligner(opt, idx)
    rng = np.random.default_rng(9)
    names, seqs = [], []
    for i in range(64):
        p = int(rng.integers(0, G - 400))
        frag = g[p:p + 300]
        r1 = frag[:150].copy()
        r2 = (3 - frag[-150:])[::-1].copy()
        for r in (r1, r2):
            e = rng.random(150) < 0.01
            r[e] = (r[e] + 1) % 4
        names += [f"p{i}", f"p{i}"]
        seqs += [r1, r2]
    lines = al.align_pairs_batch(names, seqs)
    primary = {}
    for ln in lines:
        _check_record(ln, idx)
        f = ln.split("\t")
        flag = int(f[1])
        assert flag & 0x1, "PE record missing paired flag"
        if not (flag & 0x900):
            primary.setdefault(f[0], []).append(f)
    for name, recs in primary.items():
        assert len(recs) == 2, name
        a, b = recs
        fa, fb = int(a[1]), int(b[1])
        assert (fa & 0x40) != (fb & 0x40)  # one read1, one read2
        if fa & 0x2:  # proper pair: TLENs negate, RNEXT is '='
            assert fb & 0x2
            assert a[6] == "=" and b[6] == "="
            assert int(a[8]) == -int(b[8]) and int(a[8]) != 0
            assert a[7] == b[3] and b[7] == a[3]  # PNEXT reciprocity


@pytest.mark.skipif("not __import__('os').environ.get('FUZZ')",
                    reason="set FUZZ=1 for the long fuzz sweep")
def test_fuzz_sweep(world):
    """Randomized option x read-mutation sweep against the invariant
    checker (run with FUZZ=1; ~minutes)."""
    g, idx = world
    G = len(g)

    def rc(r):
        return np.where(r < 4, 3 - r, 4).astype(np.uint8)[::-1]

    for trial in range(10):
        tr = np.random.default_rng(5000 + trial)
        opt = MemOptions()
        opt.T = int(tr.choice([20, 30, 40]))
        if tr.random() < 0.3:
            from bwamem_tpu.pipeline.options import MEM_F_ALL
            opt.flag |= MEM_F_ALL
        L = int(tr.choice([100, 150, 250]))
        al = MemAligner(opt, idx)
        names, seqs = [], []
        for i in range(48):
            p = int(tr.integers(0, G - L - 20))
            r = g[p:p + L].copy()
            if i % 3 == 2:
                p2 = int(tr.integers(0, G - L))
                r = np.concatenate([g[p:p + L // 2], g[p2:p2 + L - L // 2]])
            e = tr.random(len(r)) < tr.choice([0.0, 0.02, 0.06])
            r[e] = (r[e] + 1) % 4
            if tr.random() < 0.2:
                s0 = int(tr.integers(0, len(r) - 5))
                r[s0:s0 + int(tr.integers(1, 6))] = 4
            if i % 2:
                r = rc(r)
            names.append(f"f{i}")
            seqs.append(r)
        for ln in al.align_batch(names, seqs):
            _check_record(ln, idx)
