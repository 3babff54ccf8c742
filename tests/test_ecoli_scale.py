"""E. coli-scale integration (BASELINE config 2: batched SMEM search on
100bp reads vs a ~4.6Mbp FMD-index, seed-list parity with the oracle;
plus end-to-end alignment truth). Builds a real-size index through the
native SA-IS path — this is the slowest test in the suite (~1 min)."""
import numpy as np
import pytest

from bwamem_tpu.index.build import build_index_from_codes
from bwamem_tpu.index.device import DeviceFMIndex
from bwamem_tpu.index.format import Annotation
from bwamem_tpu.oracle.fmd import FMOracle
from bwamem_tpu.pipeline.aligner import MemAligner
from bwamem_tpu.pipeline.options import MemOptions


@pytest.fixture(scope="module")
def ecoli():
    rng = np.random.default_rng(4641652)
    g = rng.integers(0, 4, 4_600_000, dtype=np.uint8)
    ann = Annotation(names=["U00096"], lengths=[len(g)], offsets=[0])
    idx = build_index_from_codes(g, ann, sa_intv=8)
    return g, idx


def test_smem_parity_at_scale(ecoli):
    g, idx = ecoli
    fm = DeviceFMIndex.from_host(idx)
    orc = FMOracle(idx)
    al = MemAligner(MemOptions(), idx, fm=fm)
    rng = np.random.default_rng(5)
    seqs = []
    for i in range(12):
        p = int(rng.integers(0, len(g) - 100))
        r = g[p : p + 100].copy()
        for _ in range(int(rng.integers(0, 3))):
            r[int(rng.integers(0, 100))] = (r[int(rng.integers(0, 100))]
                                            + 1) % 4
        seqs.append(r)
    got = al.seed_batch(seqs)
    for b, seq in enumerate(seqs):
        # the aligner defaults to the vanilla 3-round collector
        # (full_reseed; rounds 2+3 of bwa_index/bwamem.c:114-162)
        mems = orc.collect_intv_vanilla(seq, min_seed_len=19)
        want_set = set()
        for m in mems:
            step = m.s // 500 if m.s > 500 else 1
            j = count = 0
            while j < m.s and count < 500:
                want_set.add((m.start, m.end, orc.sa_lookup(m.k + j)))
                j += step
                count += 1
        got_set = {(qb, qe, rb) for qb, qe, rb, _ in got[b]}
        assert got_set == want_set, b


def test_e2e_truth_at_scale(ecoli):
    g, idx = ecoli
    al = MemAligner(MemOptions(), idx)
    rng = np.random.default_rng(6)
    names, seqs, truth = [], [], []
    for i in range(150):
        p = int(rng.integers(0, len(g) - 150))
        r = g[p : p + 150].copy()
        err = rng.random(150) < 0.01
        r[err] = (r[err] + 1 + rng.integers(0, 3, err.sum())) % 4
        if i % 2:
            r = (3 - r)[::-1]
        names.append(f"e{i}")
        seqs.append(r)
        truth.append(p)
    lines = al.align_batch(names, seqs)
    prim = {l.split("\t")[0]: l.split("\t") for l in lines
            if not int(l.split("\t")[1]) & 0x900}
    ok = sum(1 for i in range(150)
             if not int(prim[f"e{i}"][1]) & 4
             and abs(int(prim[f"e{i}"][3]) - 1 - truth[i]) <= 5)
    assert ok >= 148
    mapqs = [int(prim[f"e{i}"][4]) for i in range(150)]
    assert np.median(mapqs) == 60
