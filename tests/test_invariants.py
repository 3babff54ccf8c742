"""SAM invariant fuzzing: every emitted record must be self-consistent
regardless of input. Catches classes of bugs truth-position tests miss
(CIGAR arithmetic, MD/NM coherence, pair field symmetry)."""
import re

import numpy as np
import pytest

from bwamem_tpu.index.build import build_index_from_codes
from bwamem_tpu.index.format import Annotation
from bwamem_tpu.pipeline.aligner import MemAligner
from bwamem_tpu.pipeline.options import MemOptions

_CIG = re.compile(r"(\d+)([MIDSH])")
_MD = re.compile(r"(\d+|\^[A-Z]+|[A-Z])")


def check_record(f, idx, seq_len_by_name):
    flag = int(f[1])
    if flag & 4:
        assert f[5] == "*" and f[4] == "0"
        return
    ops = [(int(n), c) for n, c in _CIG.findall(f[5])]
    # CIGAR query length == SEQ length (when SEQ present)
    qlen = sum(n for n, c in ops if c in "MIS")
    if f[9] != "*":
        assert qlen == len(f[9]), (f[0], f[5], len(f[9]))
    # reference span within contig
    rlen = sum(n for n, c in ops if c in "MD")
    pos = int(f[3]) - 1
    assert 0 <= pos and pos + rlen <= seq_len_by_name[f[2]], f[0]
    # no adjacent same ops, no leading/trailing D
    assert all(a[1] != b[1] for a, b in zip(ops, ops[1:])), f[5]
    assert ops[0][1] != "D" and ops[-1][1] != "D", f[5]
    # MD/NM coherence: MD match count == aligned M bases minus mismatches;
    # NM == mismatches + I + D lengths
    tags = dict(t.split(":", 1) for t in f[11:])
    if "MD" in tags and "NM" in tags:
        md = tags["MD"].split(":", 1)[1]
        n_match = sum(int(t) for t in _MD.findall(md) if t.isdigit())
        n_mm = sum(1 for t in _MD.findall(md)
                   if not t.isdigit() and not t.startswith("^"))
        n_del_md = sum(len(t) - 1 for t in _MD.findall(md)
                       if t.startswith("^"))
        m_bases = sum(n for n, c in ops if c == "M")
        assert n_match + n_mm == m_bases, (f[0], md, f[5])
        n_ins = sum(n for n, c in ops if c == "I")
        n_del = sum(n for n, c in ops if c == "D")
        assert n_del_md == n_del, (f[0], md, f[5])
        assert int(tags["NM"].split(":", 1)[1]) == n_mm + n_ins + n_del, f[0]


@pytest.fixture(scope="module")
def env():
    rng = np.random.default_rng(55)
    g = rng.integers(0, 4, 80000, dtype=np.uint8)
    ann = Annotation(names=["cA", "cB"], lengths=[50000, 30000],
                     offsets=[0, 50000])
    idx = build_index_from_codes(g, ann, sa_intv=8)
    return g, idx, {"cA": 50000, "cB": 30000}


def _fuzz_reads(g, rng, n):
    names, seqs = [], []
    for i in range(n):
        kind = rng.integers(0, 6)
        ln = int(rng.integers(30, 250))
        p = int(rng.integers(0, len(g) - ln))
        r = g[p : p + ln].copy()
        if kind == 0:    # clean
            pass
        elif kind == 1:  # heavy substitutions
            for _ in range(int(rng.integers(1, ln // 4 + 1))):
                r[int(rng.integers(0, ln))] = int(rng.integers(0, 5))
        elif kind == 2:  # indel
            cut = int(rng.integers(5, max(ln - 5, 6)))
            dl = int(rng.integers(1, 12))
            r = np.concatenate([r[:cut], r[cut + dl:],
                                rng.integers(0, 4, dl).astype(r.dtype)])
        elif kind == 3:  # chimeric halves
            p2 = int(rng.integers(0, len(g) - ln))
            r[ln // 2:] = g[p2 : p2 + ln - ln // 2]
        elif kind == 4:  # random garbage
            r = rng.integers(0, 4, ln).astype(r.dtype)
        elif kind == 5:  # tandem-ish
            unit = g[p : p + max(ln // 4, 5)]
            r = np.tile(unit, 5)[:ln].copy()
        if i % 2:
            r = np.where(r < 4, 3 - r, 4).astype(r.dtype)[::-1]
        names.append(f"f{i}")
        seqs.append(r)
    return names, seqs


def test_se_invariants_fuzz(env):
    g, idx, lens = env
    al = MemAligner(MemOptions(), idx)
    rng = np.random.default_rng(1)
    names, seqs = _fuzz_reads(g, rng, 300)
    lines = al.align_batch(names, seqs)
    assert len({l.split("\t")[0] for l in lines}) == 300
    for l in lines:
        check_record(l.split("\t"), idx, lens)


def test_pe_invariants_fuzz(env):
    g, idx, lens = env
    al = MemAligner(MemOptions(), idx)
    rng = np.random.default_rng(2)
    names, seqs = [], []
    for i in range(60):
        isize = int(rng.normal(400, 40))
        isize = max(220, isize)
        p = int(rng.integers(0, 50000 - isize - 1))
        r1 = g[p : p + 100].copy()
        r2 = (3 - g[p + isize - 100 : p + isize])[::-1].copy()
        if i % 7 == 0:  # garbage mate
            r2 = rng.integers(0, 4, 100).astype(r2.dtype)
        names += [f"p{i}", f"p{i}"]
        seqs += [r1, r2]
    lines = al.align_pairs_batch(names, seqs)
    recs = {}
    for l in lines:
        f = l.split("\t")
        check_record(f, idx, lens)
        flag = int(f[1])
        assert flag & 1, "PE records must be flagged paired"
        if not flag & 0x900:
            recs[(f[0], 1 if flag & 0x40 else 2)] = f
    # both ends present for every pair; TLEN antisymmetry on proper pairs
    for i in range(60):
        f1 = recs[(f"p{i}", 1)]
        f2 = recs[(f"p{i}", 2)]
        if int(f1[1]) & 2:
            assert int(f1[8]) == -int(f2[8]) != 0
            assert f1[6] == "=" and f2[6] == "="
            # mate coordinates cross-consistent
            assert int(f1[7]) == int(f2[3]) and int(f2[7]) == int(f1[3])
