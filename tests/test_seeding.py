"""Batched device seeding vs the SMEM oracle (flat-pool API)."""
import jax.numpy as jnp
import numpy as np

from bwamem_tpu.index.device import DeviceFMIndex
from bwamem_tpu.ops.seeding import SeedConfig, smem_seed_batch
from bwamem_tpu.oracle.fmd import FMOracle


def oracle_seeds(orc, q, min_seed_len, max_occ):
    """Expected (qbeg, qend, rbeg, n_occ) seed list, in qend order."""
    mems = orc.collect_smems(q, min_seed_len=min_seed_len)
    out = []
    for m in sorted(mems, key=lambda m: m.end):
        step = m.s // max_occ if m.s > max_occ else 1
        j = 0
        count = 0
        while j < m.s and count < max_occ:
            out.append((m.start, m.end, orc.sa_lookup(m.k + j), m.s))
            j += step
            count += 1
    return out


def _run_batch(idx, reads_list, min_seed_len, max_occ=500):
    fm = DeviceFMIndex.from_host(idx)
    L = max(len(r) for r in reads_list)
    B = len(reads_list)
    reads = np.full((B, L), 4, dtype=np.int32)
    lens = np.zeros(B, dtype=np.int32)
    for i, r in enumerate(reads_list):
        reads[i, : len(r)] = r
        lens[i] = len(r)
    cfg = SeedConfig(min_seed_len=min_seed_len, max_occ=max_occ)
    out = smem_seed_batch(fm, jnp.asarray(reads), jnp.asarray(lens), cfg)
    out = {k: np.asarray(v) for k, v in out.items()}
    n = int(out["n_seeds"])
    per_read = [[] for _ in range(B)]
    for t in range(n):
        per_read[out["read_id"][t]].append(
            (int(out["qbeg"][t]), int(out["qend"][t]),
             int(out["rbeg"][t]), int(out["n_occ"][t])))
    assert not out["overflow"]
    return per_read


def test_seeding_matches_oracle(tiny_index):
    g, idx = tiny_index
    orc = FMOracle(idx)
    rng = np.random.default_rng(8)

    reads = []
    for trial in range(12):
        ln = int(rng.integers(40, 100))
        pos = int(rng.integers(0, len(g) - ln))
        q = g[pos : pos + ln].copy()
        for _ in range(int(rng.integers(0, 4))):
            i = int(rng.integers(0, ln))
            q[i] = (q[i] + 1 + rng.integers(0, 3)) % 4
        if trial % 3 == 0:
            q = (3 - q)[::-1]  # reverse strand read
        if trial == 5:
            q[10] = 4  # embed an N
        reads.append(q)

    got_all = _run_batch(idx, reads, min_seed_len=15)
    for b, q in enumerate(reads):
        exp = oracle_seeds(orc, q, 15, 500)
        assert got_all[b] == exp, f"read {b}"


def test_seeding_subsampling(tiny_index):
    """Force the stride/cap path with a tiny max_occ."""
    g, idx = tiny_index
    orc = FMOracle(idx)
    q = g[300:360].copy()
    got = _run_batch(idx, [q], min_seed_len=15, max_occ=1)
    assert got[0] == oracle_seeds(orc, q, 15, 1)


def test_gather_window_fast_matches_per_base(tiny_index):
    import jax.numpy as jnp
    from bwamem_tpu.index.device import DeviceFMIndex
    from bwamem_tpu.ops.refgather import gather_bases, gather_window_fast

    g, idx = tiny_index
    fm = DeviceFMIndex.from_host(idx)
    rng = np.random.default_rng(3)
    L = 90
    # random windows incl. negative starts, strand crossing, end overflow
    starts = np.concatenate([
        rng.integers(-20, 2 * idx.l_pac + 20, 64),
        [int(idx.l_pac) - 5, int(idx.l_pac) - L + 3, -L + 1,
         2 * int(idx.l_pac) - 3, 0],
    ]).astype(np.int64)
    s = jnp.asarray(starts)
    want = np.asarray(gather_bases(
        fm, s[:, None] + jnp.arange(L, dtype=jnp.int32)[None, :]))
    got = np.asarray(gather_window_fast(fm, s, L))
    np.testing.assert_array_equal(got, want)


def test_text_walk_edges(tiny_index):
    """Deterministic edge cases for the unique-suffix text walk
    (_text_extend_left): a unique read must back-extend across the whole
    read (match hits READ start), a read at position 0 must stop at TEXT
    start, a read whose left flank mismatches at a known base must stop
    exactly there, an embedded N must bound the extension, and a
    reverse-strand read exercises the doubled-coordinate mapping. Each
    case compares the full (qbeg, qend, rbeg, n_occ) seed list to the
    FM oracle, so a text/FM disagreement in either qbeg or the direct
    rbeg fails loudly."""
    g, idx = tiny_index
    orc = FMOracle(idx)

    reads = []
    exact = g[500:580].copy()           # unique: extends to read start
    reads.append(exact)
    at_zero = g[0:70].copy()            # occurrence at text position 0
    reads.append(at_zero)
    mism = g[700:790].copy()
    mism[30] = (mism[30] + 2) % 4       # walk from the right stops at 30
    reads.append(mism)
    withn = g[900:980].copy()
    withn[25] = 4                       # N bounds both segments
    reads.append(withn)
    rev = (3 - g[1200:1290])[::-1].copy()   # reverse strand, unique
    reads.append(rev)
    tail = g[2000 - 64:2000].copy()     # occurrence ends at text end
    reads.append(tail)

    got_all = _run_batch(idx, reads, min_seed_len=15)
    for b, q in enumerate(reads):
        assert got_all[b] == oracle_seeds(orc, q, 15, 500), f"case {b}"


def test_text_walk_repeat_lanes_stay_fm(tiny_index):
    """Reads inside an exact repeat keep s > 1 to the walk's end — the
    text path must not fire for them (they resolve via the expansion SA
    walk as before) while mixed unique/repeat batches stay exact."""
    g, idx0 = tiny_index
    from bwamem_tpu.index.build import build_index_from_codes
    from bwamem_tpu.index.format import Annotation

    g2 = g.copy()
    g2[1500:1580] = g2[100:180]         # plant an exact 80 bp duplicate
    ann = Annotation(names=["chr1"], lengths=[len(g2)], offsets=[0])
    idx = build_index_from_codes(g2, ann, sa_intv=8)
    orc = FMOracle(idx)
    reads = [g2[110:170].copy(),        # inside the repeat: s == 2
             g2[400:460].copy()]        # unique control
    got_all = _run_batch(idx, reads, min_seed_len=15)
    for b, q in enumerate(reads):
        exp = oracle_seeds(orc, q, 15, 500)
        assert got_all[b] == exp, f"case {b}"
        if b == 0:
            assert all(occ == 2 for _, _, _, occ in exp)
