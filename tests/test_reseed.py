"""Vanilla seeding rounds 2+3 (split re-seed + LAST-like) vs the oracle.

The fork's GPUSeed only runs round 1 (src/bwamem.c:140 re_seed=0 gates the
CPU rounds off and seed_gen.cu never implements them), but the golden-SAM
oracle methodology runs vanilla bwa, whose mem_collect_intv always re-seeds
(reference tree: bwa_index/bwamem.c:114-162). These tests pin the device
implementation (ops/seeding.py reseed=True) to the scalar oracle port
(oracle/fmd.py collect_intv_vanilla) on repeat-rich genomes where the
rounds actually fire.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from bwamem_tpu.index.build import build_index_from_codes
from bwamem_tpu.index.device import DeviceFMIndex
from bwamem_tpu.index.format import Annotation
from bwamem_tpu.ops.seeding import SeedConfig, smem_seed_batch
from bwamem_tpu.oracle.fmd import FMOracle

MSL = 15  # min seed len used throughout (short reads in these tests)


def oracle_seeds(orc, q, max_occ=500, **kw):
    """Expected (qbeg, qend, rbeg, n_occ) list in vanilla (qbeg, qend)
    interval order with SA-rank occurrence expansion."""
    mems = orc.collect_intv_vanilla(q, min_seed_len=MSL, **kw)
    out = []
    for m in mems:
        step = m.s // max_occ if m.s > max_occ else 1
        j = 0
        count = 0
        while j < m.s and count < max_occ:
            out.append((m.start, m.end, orc.sa_lookup(m.k + j), m.s))
            j += step
            count += 1
    return out


def device_seeds(idx, reads_list, max_occ=500, **cfg_kw):
    fm = DeviceFMIndex.from_host(idx)
    L = max(len(r) for r in reads_list)
    B = len(reads_list)
    reads = np.full((B, L), 4, dtype=np.int32)
    lens = np.zeros(B, dtype=np.int32)
    for i, r in enumerate(reads_list):
        reads[i, : len(r)] = r
        lens[i] = len(r)
    cfg = SeedConfig(min_seed_len=MSL, max_occ=max_occ, reseed=True,
                     cand_pool=64, seed_pool=512, r2_pool=16,
                     r2_cand=32, r3_pool=8, **cfg_kw)
    out = smem_seed_batch(fm, jnp.asarray(reads), jnp.asarray(lens), cfg)
    out = {k: np.asarray(v) for k, v in out.items()}
    assert not out["overflow"]
    per_read = [[] for _ in range(B)]
    for t in range(int(out["n_seeds"])):
        per_read[out["read_id"][t]].append(
            (int(out["qbeg"][t]), int(out["qend"][t]),
             int(out["rbeg"][t]), int(out["n_occ"][t])))
    return per_read


@pytest.fixture(scope="module")
def repeat_index():
    """Genome with a dispersed repeat family + tandem array so that long
    low-occ SMEMs (round-2 parents) and sub-max_mem_intv windows (round-3
    emitters) both exist."""
    rng = np.random.default_rng(42)
    g = rng.integers(0, 4, 6000, dtype=np.uint8)
    elem = rng.integers(0, 4, 120, dtype=np.uint8)
    for p in range(0, 5400, 600):  # 10 diverged copies
        c = elem.copy()
        hits = rng.random(len(c)) < 0.04
        c[hits] = (c[hits] + rng.integers(1, 4, hits.sum())) % 4
        g[p:p + len(c)] = c
    unit = rng.integers(0, 4, 25, dtype=np.uint8)
    g[5500:5500 + 20 * 25] = np.tile(unit, 20)
    ann = Annotation(names=["chr1"], lengths=[len(g)], offsets=[0])
    return g, build_index_from_codes(g, ann, sa_intv=4)


def _mk_reads(rng, g, n, ln):
    reads = []
    for t in range(n):
        pos = int(rng.integers(0, len(g) - ln))
        q = g[pos:pos + ln].copy()
        for _ in range(int(rng.integers(0, 4))):
            i = int(rng.integers(0, ln))
            q[i] = (q[i] + 1 + rng.integers(0, 3)) % 4
        if t % 3 == 0:
            q = (3 - q)[::-1]
        if t % 7 == 5:
            q[int(rng.integers(0, ln))] = 4  # embed an N
        reads.append(q)
    return reads


def test_reseed_matches_oracle(repeat_index):
    g, idx = repeat_index
    orc = FMOracle(idx)
    rng = np.random.default_rng(3)
    reads = _mk_reads(rng, g, 24, 90)
    got = device_seeds(idx, reads)
    for b, q in enumerate(reads):
        assert got[b] == oracle_seeds(orc, q), f"read {b}"


def test_reseed_fires(repeat_index):
    """The rounds must actually add seeds on repeat reads (guards against
    a silently-disabled implementation)."""
    g, idx = repeat_index
    orc = FMOracle(idx)
    q = g[600:690].copy()  # inside a repeat copy
    with_rounds = orc.collect_intv_vanilla(q, min_seed_len=MSL)
    round1 = orc.collect_smems(q, min_seed_len=MSL)
    assert len(with_rounds) > len(round1)


def test_reseed_max_occ_subsample(repeat_index):
    g, idx = repeat_index
    orc = FMOracle(idx)
    rng = np.random.default_rng(9)
    reads = _mk_reads(rng, g, 8, 70)
    got = device_seeds(idx, reads, max_occ=2)
    for b, q in enumerate(reads):
        assert got[b] == oracle_seeds(orc, q, max_occ=2), f"read {b}"


def test_reseed_split_params(repeat_index):
    """Non-default split gates (-r/-s/max_mem_intv) flow through."""
    g, idx = repeat_index
    orc = FMOracle(idx)
    rng = np.random.default_rng(11)
    reads = _mk_reads(rng, g, 8, 90)
    kw = dict(split_factor=1.2, split_width=20, max_mem_intv=40)
    got = device_seeds(idx, reads, **kw)
    for b, q in enumerate(reads):
        assert got[b] == oracle_seeds(orc, q, **kw), f"read {b}"
