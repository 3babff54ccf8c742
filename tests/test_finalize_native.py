"""Native SE finalization (bm_finalize_se_batch) vs the Python twin.

The native call subsumes mark-primary, record selection, XA generation,
CIGAR/NM/MD solving and SAM text assembly; every line must match the
Python path byte-for-byte across option combinations.
"""
import numpy as np
import pytest

from bwamem_tpu.pipeline.aligner import MemAligner
from bwamem_tpu.pipeline.options import (MemOptions, MEM_F_ALL,
                                         MEM_F_SOFTCLIP, MEM_F_NO_MULTI,
                                         MEM_F_REF_HDR)


def _mk_reads(rng, g, n, L=100, err=0.02, chimeric_every=7):
    names, seqs, quals = [], [], []
    for i in range(n):
        if i % chimeric_every == 3 and len(g) > 4 * L:
            p1 = int(rng.integers(0, len(g) - L))
            p2 = int(rng.integers(0, len(g) - L))
            r = np.concatenate([g[p1: p1 + L // 2], g[p2: p2 + L - L // 2]])
        else:
            p = int(rng.integers(0, len(g) - L))
            r = g[p: p + L].copy()
        e = rng.random(L) < err
        r[e] = (r[e] + 1 + rng.integers(0, 3, e.sum())) % 4
        if i % 2:
            r = (3 - r)[::-1]
        if i % 11 == 5:
            r[L // 3] = 4
        names.append(f"q{i}")
        seqs.append(r)
        quals.append("I" * L if i % 3 else None)
    return names, seqs, quals


@pytest.fixture(scope="module")
def repetitive_index():
    from bwamem_tpu.index.build import build_index_from_codes
    from bwamem_tpu.index.format import Annotation

    r = np.random.default_rng(44)
    unit = r.integers(0, 4, 211, dtype=np.uint8)
    g = np.concatenate([
        r.integers(0, 4, 6000, dtype=np.uint8),
        np.tile(unit, 12),
        r.integers(0, 4, 6000, dtype=np.uint8),
        np.tile(unit, 5),
    ])
    half = len(g) // 2
    ann = Annotation(names=["chrA", "chrB"], lengths=[half, len(g) - half],
                     offsets=[0, half], annos=["descA", "desc with\ttab"])
    return g, build_index_from_codes(g, ann, sa_intv=4)


@pytest.mark.parametrize("optkw", [
    dict(),
    dict(flag=MEM_F_ALL),
    dict(flag=MEM_F_SOFTCLIP),
    dict(flag=MEM_F_NO_MULTI),
    dict(flag=MEM_F_REF_HDR),
    dict(T=1),
    dict(mapQ_coef_len=0),
    dict(max_XA_hits=2),
])
def test_native_finalize_matches_python(repetitive_index, optkw):
    g, idx = repetitive_index
    opt = MemOptions(**optkw)
    al = MemAligner(opt, idx)
    rng = np.random.default_rng(13)
    names, seqs, quals = _mk_reads(rng, g, 40)
    per = al.collect_regs_batch(seqs)
    import copy

    per_copy = [list(lst) for lst in per]  # python path mutates regs
    py = al.emit_sam_batch(names, seqs, quals, per_copy, 7, native=False)
    nat = al.emit_sam_batch(names, seqs, quals, per, 7, native=True)
    assert nat == py


def test_native_finalize_rg_and_comments(repetitive_index):
    g, idx = repetitive_index
    opt = MemOptions()
    opt.rg_id = "sample1"
    opt.copy_comment = True
    al = MemAligner(opt, idx)
    rng = np.random.default_rng(29)
    names, seqs, quals = _mk_reads(rng, g, 12)
    comments = [f"BC:Z:AC{i}G" if i % 2 else None for i in range(12)]
    per = al.collect_regs_batch(seqs)
    per_copy = [list(lst) for lst in per]
    py = al.emit_sam_batch(names, seqs, quals, per_copy, 0,
                           comments=comments, native=False)
    nat = al.emit_sam_batch(names, seqs, quals, per, 0,
                            comments=comments, native=True)
    assert nat == py


def test_native_finalize_unmapped_and_empty(repetitive_index):
    g, idx = repetitive_index
    al = MemAligner(MemOptions(), idx)
    rng = np.random.default_rng(5)
    # random garbage reads (mostly unmapped) + a zero-length read
    seqs = [rng.integers(0, 4, 80).astype(np.uint8) for _ in range(6)]
    seqs.append(np.zeros(0, np.uint8))
    names = [f"u{i}" for i in range(7)]
    quals = [None] * 7
    per = al.collect_regs_batch(seqs)
    per_copy = [list(lst) for lst in per]
    py = al.emit_sam_batch(names, seqs, quals, per_copy, 0, native=False)
    nat = al.emit_sam_batch(names, seqs, quals, per, 0, native=True)
    assert nat == py


def _mk_pairs(rng, g, npairs, L=100, insert=260, err=0.02):
    names, seqs, quals = [], [], []
    for i in range(npairs):
        p = int(rng.integers(0, len(g) - insert - L - 4))
        a = g[p: p + L].copy()
        b = (3 - g[p + insert: p + insert + L])[::-1].copy()
        if i % 9 == 4:  # discordant pair
            p2 = int(rng.integers(0, len(g) - L))
            b = g[p2: p2 + L].copy()
        if i % 13 == 6:  # one garbage end (unmapped)
            b = rng.integers(0, 4, L).astype(np.uint8)
        for r in (a, b):
            e = rng.random(L) < err
            r[e] = (r[e] + 1 + rng.integers(0, 3, e.sum())) % 4
        names += [f"p{i}", f"p{i}"]
        seqs += [a, b]
        quals += ["I" * L if i % 3 else None] * 2
    return names, seqs, quals


@pytest.mark.parametrize("optkw", [
    dict(),
    dict(flag=MEM_F_ALL),
    dict(flag=MEM_F_SOFTCLIP),
    dict(T=1),
])
def test_native_finalize_pe_matches_python(repetitive_index, optkw):
    import copy

    from bwamem_tpu.native import loader
    from bwamem_tpu.pipeline.hostpool import _emit_pe

    g, idx = repetitive_index
    opt = MemOptions(**optkw)
    al = MemAligner(opt, idx)
    rng = np.random.default_rng(77)
    names, seqs, quals = _mk_pairs(rng, g, 30)
    pair_regs, pes = al.collect_pairs_batch(seqs)
    pr_copy = [[list(p[0]), list(p[1])] for p in pair_regs]
    py = _emit_pe(opt, idx, names, seqs, quals, pr_copy, pes, 5,
                  native=False)
    nat = _emit_pe(opt, idx, names, seqs, quals, pair_regs, pes, 5,
                   native=True)
    assert nat == py


def test_native_finalize_pe_nopairing(repetitive_index):
    from bwamem_tpu.pipeline.options import MEM_F_NOPAIRING
    from bwamem_tpu.pipeline.hostpool import _emit_pe

    g, idx = repetitive_index
    opt = MemOptions(flag=MEM_F_NOPAIRING)
    al = MemAligner(opt, idx)
    rng = np.random.default_rng(78)
    names, seqs, quals = _mk_pairs(rng, g, 16)
    pair_regs, pes = al.collect_pairs_batch(seqs)
    pr_copy = [[list(p[0]), list(p[1])] for p in pair_regs]
    py = _emit_pe(opt, idx, names, seqs, quals, pr_copy, pes, 0,
                  native=False)
    nat = _emit_pe(opt, idx, names, seqs, quals, pair_regs, pes, 0,
                   native=True)
    assert nat == py
