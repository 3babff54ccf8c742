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
