"""Alive-lane decay curves of the round-1 and round-2 backward walks on
the bench genome — picks the staged-compaction schedule in
ops/seeding._backward_pass (compact_at / cap fractions).

Usage: python tools/bwdecay.py [B] [--random]
Prints, per walk, the alive fraction after each trip (fixed 48 trips,
no early exit) at the learned production pools.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bwamem_tpu.index.device import DeviceFMIndex
    from bwamem_tpu.ops import fm as fmops
    from bwamem_tpu.ops import seeding as S

    rng = np.random.default_rng(12345)
    G = 4_600_000
    L = 150
    B = next((int(a) for a in sys.argv[1:] if a.isdigit()), 16384)
    import bench as benchmod

    g, _contigs, idx = benchmod._bench_world(
        G, random_genome="--random" in sys.argv)
    fm = DeviceFMIndex.from_host(idx)

    reads = np.full((B, L), 4, np.int8)
    for i in range(B):
        p = int(rng.integers(0, G - L))
        r = g[p:p + L].copy()
        err = rng.random(L) < 0.01
        r[err] = (r[err] + 1) % 4
        reads[i] = r
    lens = np.full(B, L, np.int32)
    rj = jnp.asarray(reads)
    lj = jnp.asarray(lens)

    from bwamem_tpu.pipeline.poolstore import PoolStore
    learned = (PoolStore().lookup(PoolStore.key("smem", True, 19, 160,
                                                gid=G)) or {})
    cfg = S.SeedConfig(reseed=True, **{"seed_pool": 16, **learned})
    print(f"pools: {learned}", flush=True)
    TRIPS = 48

    @jax.jit
    def decay(reads, lens):
        reads = reads.astype(jnp.int32)
        lens = lens.astype(jnp.int32)
        B, L = reads.shape
        start, k, s, emit, r3 = S._forward_pass2(
            fm, reads, lens, cfg.min_seed_len,
            strategy=(cfg.min_seed_len, cfg.max_mem_intv))
        NP = emit.shape[1]
        end = jnp.broadcast_to(jnp.arange(NP, dtype=jnp.int32), (B, NP))
        cand_cap = B * cfg.cand_pool
        (start, end, k, s), rid, valid, _ = S._compact_global(
            (start, end, k, s), emit, cand_cap)

        def curve(rid_, qbeg, kk, ss, vv, floor, group):
            reads_flat = reads.reshape(-1)
            floor = (jnp.ones_like(ss) if floor is None
                     else floor.astype(ss.dtype))
            group = rid_ if group is None else group

            def body(st, _):
                qb, kk_, ss_, done = st
                j = qb - 1
                can = ~done & (j >= 0)
                base = reads_flat[jnp.clip(rid_ * L + j, 0, B * L - 1)]
                can &= base < 4
                nk, ns = fmops.backward_ext_ks_batch(
                    fm, jnp.where(can, kk_, 0), jnp.where(can, ss_, 1),
                    jnp.where(can, jnp.clip(base, 0, 3), 0))
                ok = can & (ns >= floor)
                qb = jnp.where(ok, j, qb)
                kk_ = jnp.where(ok, nk, kk_)
                ss_ = jnp.where(ok, ns, ss_)
                done = ~ok
                nxt = lambda a: jnp.concatenate([a[1:], a[-1:]])
                same = (jnp.concatenate(
                    [group[1:], jnp.full((1,), -1, group.dtype)]) == group)
                same &= (nxt(qb) == qb) & (nxt(ss_) == ss_) & (nxt(kk_) == kk_)
                done |= same
                return (qb, kk_, ss_, done), jnp.sum((~done).astype(
                    jnp.int32))
            st0 = (qbeg, kk, ss, jnp.logical_not(vv))
            _, alive = jax.lax.scan(body, st0, None, length=TRIPS)
            return alive, jnp.sum(vv.astype(jnp.int32))

        a1, n1 = curve(rid, start, k, s, valid, None, None)

        # round-2 lanes: run the real round-1 walk first (product path)
        qbeg, kf, sf, _ = S._backward_pass(fm, reads, rid, start, k, s,
                                           valid, text_walk=False)
        keep = S._containment_filter(qbeg, end, rid, valid,
                                     cfg.min_seed_len)
        dt = fmops.idx_dt(fm)
        split_len = int(cfg.min_seed_len * cfg.split_factor + 0.499)
        qualify = keep & (end - qbeg >= split_len) & (sf <= cfg.split_width)
        lane_cap = B * cfg.r2_pool
        (lrid, lx, lfloor), lvalid, _ = S._compact_flat(
            (rid, (qbeg + end) >> 1, (sf + 1).astype(dt)), qualify,
            lane_cap)
        kb, sb, eb, filled = S._reseed_forward(
            fm, reads, lens, lrid, lx, lfloor, lvalid, cfg.min_seed_len)
        E = kb.shape[1]
        flat = lambda a: jnp.broadcast_to(
            a[:, None], (lane_cap, E)).reshape(-1)
        lane_ids = flat(jnp.arange(lane_cap, dtype=jnp.int32))
        cand2_cap = B * cfg.r2_cand
        (rid2, lane2, x2, floor2, k2, s2, end2), v2, _ = S._compact_flat(
            (flat(lrid), lane_ids, flat(lx), flat(lfloor),
             kb.reshape(-1), sb.reshape(-1), eb.reshape(-1)),
            filled.reshape(-1), cand2_cap)
        a2, n2 = curve(rid2, x2, k2, s2, v2, floor2, lane2)
        return a1, n1, a2, n2

    a1, n1, a2, n2 = (np.asarray(x) for x in decay(rj, lj))
    for name, a, n, P in (("round1", a1, n1, B * cfg.cand_pool),
                          ("round2", a2, n2, B * cfg.r2_cand)):
        print(f"{name}: lanes={P} valid={int(n)} "
              f"({int(n) / P:.2f} of pool)")
        fr = a / max(int(n), 1)
        frp = a / P
        for t in range(0, TRIPS, 2):
            print(f"  trip {t + 1:2d}: alive={int(a[t]):7d} "
                  f"({fr[t]:.3f} of valid, {frp[t]:.3f} of pool)")


if __name__ == "__main__":
    main()
