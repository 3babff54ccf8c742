"""Seed-type variants: -u 2/3/4 and -g all-MEM mode vs direct oracles
(reference: src/bwt.c:593-769 bwt_bowtie_seed(_inexact)/bwt_fwd_mem,
GPUSeed mem kernels seed_gen.cu:722-812)."""
import numpy as np
import pytest

from bwamem_tpu.index.build import build_index_from_codes
from bwamem_tpu.index.format import Annotation
from bwamem_tpu.pipeline.aligner import MemAligner
from bwamem_tpu.pipeline.options import MemOptions


@pytest.fixture(scope="module")
def env():
    rng = np.random.default_rng(21)
    g = rng.integers(0, 4, 20000, dtype=np.uint8)
    ann = Annotation(names=["c"], lengths=[20000], offsets=[0])
    idx = build_index_from_codes(g, ann, sa_intv=8)
    return g, idx


def _naive_occurrences(g, pat):
    """All forward+revcomp occurrences (doubled coords) of a pattern."""
    out = []
    s = "".join(map(str, g))
    p = "".join(map(str, pat))
    i = s.find(p)
    while i >= 0:
        out.append(i)
        i = s.find(p, i + 1)
    rc = "".join(str(3 - c) for c in g[::-1])
    i = rc.find(p)
    while i >= 0:
        out.append(len(g) + i)
        i = rc.find(p, i + 1)
    return sorted(out)


def test_bowtie_exact_seeds(env):
    """-u 2: one exact seed of length k at each stride position, with all
    its reference occurrences."""
    import jax.numpy as jnp

    from bwamem_tpu.ops.seeding import bowtie_seed_batch
    from bwamem_tpu.index.device import DeviceFMIndex

    g, idx = env
    fm = DeviceFMIndex.from_host(idx)
    rng = np.random.default_rng(1)
    K, J, L = 19, 19, 80
    B = 6
    reads = np.zeros((B, L), np.int32)
    for b in range(B):
        p = int(rng.integers(0, len(g) - L))
        reads[b] = g[p : p + L]
        if b == 3:  # one mismatch inside the second seed window
            reads[b, 25] = (reads[b, 25] + 1) % 4
    lens = np.full(B, L, np.int32)
    out = {k: np.asarray(v) for k, v in bowtie_seed_batch(
        fm, jnp.asarray(reads), jnp.asarray(lens), seed_len=K, stride=J,
        inexact=False).items()}
    n = int(out["n_seeds"])
    for b in range(B):
        mine = [(out["qbeg"][i], out["rbeg"][i]) for i in range(n)
                if out["read_id"][i] == b]
        for x in range(0, L - K + 1, J):
            pat = reads[b, x : x + K]
            occ = _naive_occurrences(g, pat)
            got = sorted(r for q, r in mine if q == x)
            assert got == occ, (b, x)


def test_bowtie_inexact_rescues_mismatch_seed(env):
    """-u 4: a window with one mismatch still yields a seed placed at the
    true locus (exact mode yields none)."""
    import jax.numpy as jnp

    from bwamem_tpu.ops.seeding import bowtie_seed_batch
    from bwamem_tpu.index.device import DeviceFMIndex

    g, idx = env
    fm = DeviceFMIndex.from_host(idx)
    K = 19
    p = 5000
    read = g[p : p + K].astype(np.int32).copy()
    read[9] = (read[9] + 1) % 4  # mismatch mid-seed
    reads = read[None, :]
    lens = np.array([K], np.int32)
    exact = {k: np.asarray(v) for k, v in bowtie_seed_batch(
        fm, jnp.asarray(reads), jnp.asarray(lens), seed_len=K, stride=K,
        inexact=False).items()}
    assert int(exact["n_seeds"]) == 0
    inx = {k: np.asarray(v) for k, v in bowtie_seed_batch(
        fm, jnp.asarray(reads), jnp.asarray(lens), seed_len=K, stride=K,
        inexact=True).items()}
    rbegs = [int(inx["rbeg"][i]) for i in range(int(inx["n_seeds"]))]
    assert p in rbegs


def test_fwdmem_segments(env):
    """-u 3: forward-only maximal segments; a mid-read mismatch splits the
    read into two segments at the mismatch."""
    g, idx = env
    opt = MemOptions(seed_type=3)
    al = MemAligner(opt, idx)
    p = 8000
    read = g[p : p + 100].astype(np.uint8).copy()
    read[50] = (read[50] + 1) % 4
    seeds = al.seed_batch([read])[0]
    qspans = sorted((q0, q1) for q0, q1, _, _ in seeds)
    # one segment ending at the mismatch, one covering the rest
    assert any(q0 == 0 and q1 in (50, 51) for q0, q1 in qspans), qspans
    assert any(q1 == 100 for q0, q1 in qspans), qspans


def test_mem_mode_keeps_nested(env):
    """-g: nested MEMs survive; SMEM mode returns only maximal ones.
    Compared against round-1-only SMEMs (full_reseed=False): the fork's
    -g mode replaces, not augments, its round-1 GPUSeed collection."""
    g, idx = env
    p = 3000
    read = g[p : p + 60].astype(np.uint8)
    al1 = MemAligner(MemOptions(full_reseed=False), idx)
    smems = al1.seed_batch([read])[0]
    al2 = MemAligner(MemOptions(re_seed=True), idx)
    mems = al2.seed_batch([read])[0]
    assert len(mems) >= len(smems)
    smem_set = {(q0, q1) for q0, q1, _, _ in smems}
    assert smem_set <= {(q0, q1) for q0, q1, _, _ in mems}


def test_seed_variants_end_to_end(env):
    """All seed types must still map clean simulated reads."""
    g, idx = env
    rng = np.random.default_rng(4)
    names, seqs, truth = [], [], []
    for i in range(20):
        p = int(rng.integers(0, len(g) - 120))
        r = g[p : p + 120].copy()
        j = int(rng.integers(0, 120))
        r[j] = (r[j] + 1) % 4
        if i % 2:
            r = (3 - r)[::-1]
        names.append(f"v{i}")
        seqs.append(r)
        truth.append(p)
    for st in (1, 2, 3, 4):
        al = MemAligner(MemOptions(seed_type=st), idx)
        lines = al.align_batch(names, seqs)
        prim = {l.split("\t")[0]: l.split("\t") for l in lines
                if not int(l.split("\t")[1]) & 0x900}
        ok = sum(1 for i in range(20)
                 if not int(prim[f"v{i}"][1]) & 4
                 and abs(int(prim[f"v{i}"][3]) - 1 - truth[i]) <= 5)
        assert ok >= 18, (st, ok)


def test_bowtie_kmer_table_start_identical(env):
    """The precomputed 8-mer interval-table jumpstart (fmops
    kmer_intv_table; reference idea: seed_gen.cu:1169-1205) must be
    bit-identical to stepping the walk base by base, for both -u 2 and
    -u 4 including mismatch branches inside the table prefix."""
    import jax.numpy as jnp

    from bwamem_tpu.index.device import DeviceFMIndex
    from bwamem_tpu.ops import fm as fmops
    from bwamem_tpu.ops.seeding import bowtie_seed_batch

    g, idx = env
    fm = DeviceFMIndex.from_host(idx)
    rng = np.random.default_rng(17)
    B, L = 12, 60
    reads = np.full((B, L), 4, np.int32)
    lens = np.full(B, L, np.int32)
    for i in range(B):
        p = int(rng.integers(0, len(g) - L))
        r = g[p:p + L].copy()
        r[int(rng.integers(0, 20))] ^= 1  # mismatch inside the prefix
        reads[i] = r
    tab = fmops.get_kmer_table(fm, 8)
    for inexact in (False, True):
        a = bowtie_seed_batch(fm, jnp.asarray(reads), jnp.asarray(lens),
                              seed_len=22, stride=11, inexact=inexact)
        b = bowtie_seed_batch(fm, jnp.asarray(reads), jnp.asarray(lens),
                              seed_len=22, stride=11, inexact=inexact,
                              ktab=tab, ktab_k=8)
        for key in a:
            assert (np.asarray(a[key]) == np.asarray(b[key])).all(), key
