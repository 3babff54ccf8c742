"""Paired-end tests: local-SW kernel vs oracle, insert-size inference,
pairing flags/TLEN, and mate rescue (reference semantics:
src/bwamem_pair.c; no PE tests exist in the reference — SURVEY §4)."""
import numpy as np
import pytest

from bwamem_tpu.index.build import build_index_from_codes
from bwamem_tpu.index.format import Annotation
from bwamem_tpu.pipeline.aligner import MemAligner
from bwamem_tpu.pipeline.options import MemOptions


# ----------------------------------------------------------- swalign op --

def test_sw_align_batch_vs_oracle():
    import jax.numpy as jnp

    from bwamem_tpu.ops.extend import make_score_matrix
    from bwamem_tpu.ops.swalign import sw_align_batch
    from bwamem_tpu.oracle.ksw import ksw_local

    rng = np.random.default_rng(5)
    mat = make_score_matrix(1, 4)
    N, QMAX, TMAX = 24, 48, 96
    Q = np.full((N, QMAX), 4, np.int32)
    T = np.full((N, TMAX), 4, np.int32)
    ql = np.zeros(N, np.int32)
    tl = np.zeros(N, np.int32)
    cases = []
    for i in range(N):
        qlen = int(rng.integers(8, QMAX + 1))
        tlen = int(rng.integers(16, TMAX + 1))
        t = rng.integers(0, 4, tlen).astype(np.int32)
        q = rng.integers(0, 4, qlen).astype(np.int32)
        if i % 3 != 0:  # plant the query (with noise) inside the target
            pos = int(rng.integers(0, tlen - min(qlen, tlen) + 1))
            m = min(qlen, tlen - pos)
            t[pos : pos + m] = q[:m]
            for _ in range(int(rng.integers(0, 3))):
                j = int(rng.integers(0, m))
                t[pos + j] = (t[pos + j] + 1) % 4
        Q[i, :qlen] = q
        T[i, :tlen] = t
        ql[i], tl[i] = qlen, tlen
        cases.append((q, t))
    minsc = np.full(N, 19, np.int32)
    out = sw_align_batch(jnp.asarray(Q), jnp.asarray(T), jnp.asarray(ql),
                         jnp.asarray(tl), jnp.asarray(mat),
                         jnp.asarray(minsc), 6, 1, 6, 1, 1)
    out = {k: np.asarray(v) for k, v in out.items()}
    for i, (q, t) in enumerate(cases):
        o = ksw_local(q, t, mat, 6, 1, 6, 1, minsc=19)
        assert out["score"][i] == o.score, i
        if o.score > 0:
            assert out["qe"][i] == o.qe and out["te"][i] == o.te, i
            assert out["qb"][i] == o.qb and out["tb"][i] == o.tb, i
        assert out["score2"][i] == o.score2, i


def test_sw_local_oracle_basic():
    from bwamem_tpu.ops.extend import make_score_matrix
    from bwamem_tpu.oracle.ksw import ksw_local

    mat = make_score_matrix(1, 4)
    # exact 10-bp match embedded at target offset 5
    q = np.array([0, 1, 2, 3, 0, 1, 2, 3, 0, 1], np.int32)
    t = np.concatenate([np.full(5, 2, np.int32), q,
                        np.full(5, 3, np.int32)])
    r = ksw_local(q, t, mat, 6, 1, 6, 1)
    assert r.score == 10 and (r.qb, r.qe) == (0, 9) and (r.tb, r.te) == (5, 14)


# ----------------------------------------------------------- PE end-to-end

def _simulate_pairs(rng, g, n_pairs, read_len=100, isize_mean=350,
                    isize_std=30):
    """FR-orientation pairs: read1 forward at p, read2 revcomp ending at
    p+isize."""
    names, seqs, truth = [], [], []
    for i in range(n_pairs):
        isize = int(rng.normal(isize_mean, isize_std))
        isize = max(read_len + 10, isize)
        p = int(rng.integers(0, len(g) - isize - 1))
        r1 = g[p : p + read_len].copy()
        r2 = g[p + isize - read_len : p + isize].copy()
        r2 = (3 - r2)[::-1]
        for r in (r1, r2):
            for _ in range(int(rng.integers(0, 3))):
                j = int(rng.integers(0, read_len))
                r[j] = (r[j] + 1 + rng.integers(0, 3)) % 4
        names += [f"p{i}", f"p{i}"]
        seqs += [r1, r2]
        truth.append((p, p + isize - read_len, isize))
    return names, seqs, truth


@pytest.fixture(scope="module")
def pe_env():
    rng = np.random.default_rng(42)
    g = rng.integers(0, 4, 60000, dtype=np.uint8)
    ann = Annotation(names=["chr1"], lengths=[60000], offsets=[0])
    idx = build_index_from_codes(g, ann, sa_intv=8)
    return g, MemAligner(MemOptions(), idx)


def _parse(lines):
    recs = {}
    for l in lines:
        f = l.split("\t")
        flag = int(f[1])
        if flag & 0x900:
            continue
        end = 1 if flag & 0x40 else 2
        recs[(f[0], end)] = f
    return recs


def test_pe_proper_pairs(pe_env):
    g, al = pe_env
    rng = np.random.default_rng(3)
    names, seqs, truth = _simulate_pairs(rng, g, 40)
    lines = al.align_pairs_batch(names, seqs)
    recs = _parse(lines)
    n_proper = 0
    for i in range(40):
        p1, p2, isize = truth[i]
        f1 = recs[(f"p{i}", 1)]
        f2 = recs[(f"p{i}", 2)]
        flag1, flag2 = int(f1[1]), int(f2[1])
        assert flag1 & 0x1 and flag2 & 0x1          # paired
        assert flag1 & 0x40 and flag2 & 0x80        # first/second in pair
        assert abs(int(f1[3]) - 1 - p1) <= 5
        assert abs(int(f2[3]) - 1 - p2) <= 5
        if flag1 & 0x2:
            n_proper += 1
            assert flag2 & 0x2
            assert not (flag1 & 0x10) and (flag1 & 0x20)  # FR orientation
            assert (flag2 & 0x10) and not (flag2 & 0x20)
            assert f1[6] == "=" and f2[6] == "="
            assert abs(int(f1[8]) - isize) <= 10          # TLEN ~ insert
            assert int(f1[8]) == -int(f2[8])
    assert n_proper >= 35  # nearly all simulated pairs are proper


def test_pe_mate_rescue(pe_env):
    """A mate mangled beyond seedability must be rescued by SW from its
    partner's position (reference: mem_matesw)."""
    g, al = pe_env
    rng = np.random.default_rng(11)
    # background pairs so mem_pestat can infer the insert distribution
    names, seqs, truth = _simulate_pairs(rng, g, 30)
    # the victim pair: read2 gets an error every 12 bp -> no 19-bp seed
    isize = 350
    p = 12000
    r1 = g[p : p + 100].copy()
    r2 = g[p + isize - 100 : p + isize].copy()
    r2 = (3 - r2)[::-1]
    for j in range(0, 100, 12):
        r2[j] = (r2[j] + 1) % 4
    names += ["victim", "victim"]
    seqs += [r1, r2]
    lines = al.align_pairs_batch(names, seqs)
    recs = _parse(lines)
    f2 = recs[("victim", 2)]
    flag2 = int(f2[1])
    assert not (flag2 & 0x4), "rescued mate must be mapped"
    assert abs(int(f2[3]) - 1 - (p + isize - 100)) <= 5
    assert flag2 & 0x2, "rescued pair should be proper"


def test_pe_unpaired_ends_stay_se_like(pe_env):
    """Ends on different chromosomes / random read: no proper-pair flag,
    mate fields still emitted."""
    g, al = pe_env
    rng = np.random.default_rng(13)
    names, seqs, truth = _simulate_pairs(rng, g, 30)
    # read2 is random garbage: unmappable, not rescuable
    r1 = g[500:600].copy()
    r2 = rng.integers(0, 4, 100).astype(np.uint8)
    names += ["odd", "odd"]
    seqs += [r1, r2]
    lines = al.align_pairs_batch(names, seqs)
    recs = _parse(lines)
    f1 = recs[("odd", 1)]
    flag1 = int(f1[1])
    assert flag1 & 0x1
    assert abs(int(f1[3]) - 1 - 500) <= 5


def test_pestat_inference(pe_env):
    g, al = pe_env
    rng = np.random.default_rng(7)
    names, seqs, _ = _simulate_pairs(rng, g, 60, isize_mean=400,
                                     isize_std=25)
    regs = al.collect_regs_batch(seqs)
    from bwamem_tpu.pipeline.pairing import mem_pestat

    pes = mem_pestat(al.opt, al.idx.l_pac, regs)
    assert not pes[1].failed                 # FR is the simulated dir
    assert pes[0].failed and pes[2].failed and pes[3].failed
    assert 300 < pes[1].avg < 500
    assert pes[1].low < 400 < pes[1].high
