"""Measure tunnel H2D/D2H bandwidth + RTT + pure device compute of the
seeding program (reduce-to-scalar sync, no pool transfer)."""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    # RTT: tiny transfer round trip
    x = jnp.zeros((1,), jnp.int32)
    float(x.sum())
    for _ in range(2):
        t0 = time.perf_counter()
        float((x + 1).sum())
        print(f"rtt {1e3 * (time.perf_counter() - t0):.1f} ms")

    # D2H bandwidth
    for mb in (1, 4, 16):
        n = mb << 18  # int32 count for mb MiB
        a = jnp.arange(n, dtype=jnp.int32)
        a.block_until_ready()
        np.asarray(a)
        t0 = time.perf_counter()
        np.asarray(a)
        dt = time.perf_counter() - t0
        print(f"d2h {mb} MiB: {dt * 1e3:.0f} ms = {mb / dt:.1f} MiB/s")

    # H2D bandwidth
    for mb in (1, 4, 16):
        h = np.zeros(mb << 20, np.int8)
        d = jnp.asarray(h)
        d.block_until_ready()
        t0 = time.perf_counter()
        d = jnp.asarray(h) + 1  # force materialize
        float(d.ravel()[:1].sum())
        dt = time.perf_counter() - t0
        print(f"h2d {mb} MiB: {dt * 1e3:.0f} ms = {mb / dt:.1f} MiB/s")

    # pure device compute of seeding (sync via scalar reduce, D2H = 4B)
    from dataclasses import replace

    from bwamem_tpu.index.build import build_index_from_codes
    from bwamem_tpu.index.device import DeviceFMIndex
    from bwamem_tpu.index.format import Annotation
    from bwamem_tpu.ops.seeding import SeedConfig, smem_seed_batch_stacked

    rng = np.random.default_rng(12345)
    G = 4_600_000
    L = 150
    g = rng.integers(0, 4, G, dtype=np.uint8)
    ann = Annotation(names=["ref"], lengths=[G], offsets=[0])
    idx = build_index_from_codes(g, ann, sa_intv=4)
    fm = DeviceFMIndex.from_host(idx)

    @jax.jit
    def seed_sum(reads, lens, cfg):
        return smem_seed_batch_stacked(fm, reads, lens, cfg).sum()

    for B in (8192, 32768):
        reads = np.full((B, L), 4, np.int8)
        for i in range(B):
            p = int(rng.integers(0, G - L))
            r = g[p:p + L].copy()
            err = rng.random(L) < 0.01
            r[err] = (r[err] + 1) % 4
            reads[i] = r
        lens = np.full(B, L, np.int32)
        rj, lj = jnp.asarray(reads), jnp.asarray(lens)
        for name, cfg in (
                ("off", SeedConfig(reseed=False)),
                ("on", SeedConfig(reseed=True, seed_pool=16)),
        ):
            from functools import partial
            fn = partial(smem_seed_batch_stacked, fm)
            out = fn(rj, lj, cfg)
            float(out.ravel()[:1].sum())  # compile + sync
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                out = fn(rj, lj, cfg)
                float(out.ravel()[:1].sum())
            dt = (time.perf_counter() - t0) / reps
            print(f"seed_compute B={B} {name}: {dt * 1e3:.0f} ms"
                  f" ({B / dt:.0f} reads/s)")


if __name__ == "__main__":
    main()
