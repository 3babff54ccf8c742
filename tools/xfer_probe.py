"""Proper tunnel transfer probes: fresh device buffers each rep (no
host-copy caching), pre-compiled graphs. Plus extension-kernel pure
compute on bench-like job shapes."""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    # D2H: fresh buffer per rep (x + i defeats host-side caching)
    @jax.jit
    def bump(x, i):
        return x + i

    for mb in (1, 4, 16):
        n = mb << 18
        x = jnp.zeros((n,), jnp.int32)
        np.asarray(bump(x, 1))  # compile
        t0 = time.perf_counter()
        reps = 3
        for i in range(reps):
            np.asarray(bump(x, i + 2))
        dt = (time.perf_counter() - t0) / reps
        print(f"d2h {mb} MiB: {dt * 1e3:.0f} ms = {mb / dt:.1f} MiB/s")

    # H2D: pre-compile the consumer graph; fresh host array each rep
    @jax.jit
    def consume(x):
        return x.sum()

    for mb in (1, 4, 16):
        h = np.zeros(mb << 20, np.int8)
        float(consume(jnp.asarray(h)))  # compile
        t0 = time.perf_counter()
        reps = 3
        for i in range(reps):
            h[0] = i
            float(consume(jnp.asarray(h)))
        dt = (time.perf_counter() - t0) / reps
        print(f"h2d {mb} MiB: {dt * 1e3:.0f} ms = {mb / dt:.1f} MiB/s")

    # extension pure compute: bench-like SE job mix (150bp reads, ~2
    # jobs/read, qlen ~75, tlen ~175 padded to buckets)
    from bwamem_tpu.ops.extend import ExtendParams
    from bwamem_tpu.ops.pallas.extend_kernel import extend_batch_pallas

    r = np.random.default_rng(3)
    params = ExtendParams(o_del=6, e_del=1, o_ins=6, e_ins=1, w=100,
                          zdrop=100, end_bonus=5, opt_ext=True,
                          max_mat=1, mismatch=4)
    for n, ql_, tl_ in ((16384, 128, 256), (32768, 128, 256)):
        Q = jnp.asarray(r.integers(0, 4, (n, ql_)).astype(np.int32))
        T = jnp.asarray(r.integers(0, 4, (n, tl_)).astype(np.int32))
        ql = jnp.asarray(np.full(n, 75, np.int32))
        tl = jnp.asarray(np.full(n, 175, np.int32))
        h0 = jnp.asarray(np.full(n, 75, np.int32))
        out = extend_batch_pallas(Q, T, ql, tl, h0, params)
        float(out["score"].ravel()[:1].sum())
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = extend_batch_pallas(Q, T, ql, tl, h0, params)
            float(out["score"].ravel()[:1].sum())
        dt = (time.perf_counter() - t0) / reps
        print(f"extend n={n} q{ql_} t{tl_}: {dt * 1e3:.0f} ms "
              f"({n * 75 * 175 / dt / 1e9:.0f} GCUPS eff)")


if __name__ == "__main__":
    main()
