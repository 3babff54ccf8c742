"""On-chip measurement battery: run the moment the TPU tunnel is back.

Measures, in one session (one process, shared compile cache):
  1. device-step microbench (models/mem.py device_align_step)
  2. e2e SE through the pipelined runtime  (the BENCH headline)
  3. e2e PE pairs/s
  4. reseed on vs off (device-step + e2e deltas)
  5. extension kernel GCUPS (dense + banded long-read)
  6. per-stage spans on chip (seed/extend device, native collect stages)

Writes one JSON object per measurement to /tmp/chip_battery.jsonl and a
human summary to stdout. Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/chip_battery.py [--quick]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

OUT = "/tmp/chip_battery.jsonl"


def emit(rec: dict) -> None:
    rec["t"] = time.strftime("%FT%TZ", time.gmtime())
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def sync(x) -> float:
    """Force real device completion (block_until_ready lies on the
    tunnel for small programs): tiny reduce + D2H."""
    import jax.numpy as jnp

    return float(jnp.asarray(x).ravel()[:1].sum())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--genome", type=int, default=10_000_000)
    args = ap.parse_args()
    import jax

    dev = jax.devices()[0]
    emit({"metric": "backend", "value": str(dev), "platform": dev.platform})

    from bwamem_tpu.index.build import build_index_from_codes
    from bwamem_tpu.index.format import Annotation
    from bwamem_tpu.pipeline.aligner import MemAligner
    from bwamem_tpu.pipeline.options import MemOptions

    rng = np.random.default_rng(7)
    G = args.genome if not args.quick else 1_000_000
    B = args.batch if not args.quick else 4096
    g = rng.integers(0, 4, G, dtype=np.uint8)
    ann = Annotation(names=["ref"], lengths=[G], offsets=[0])
    t0 = time.perf_counter()
    idx = build_index_from_codes(g, ann, sa_intv=4)
    emit({"metric": "index_build_s", "value": round(time.perf_counter() - t0, 1),
          "genome": G})

    rl = 150

    def mk_se(seed):
        r = np.random.default_rng(seed)
        seqs = []
        for _ in range(B):
            p = int(r.integers(0, G - rl))
            s = g[p : p + rl].copy()
            err = r.random(rl) < 0.01
            s[err] = (s[err] + 1) % 4
            seqs.append(s)
        return [f"q{i}" for i in range(B)], seqs

    def mk_pe(seed):
        r = np.random.default_rng(seed)
        names, seqs = [], []
        for i in range(B // 2):
            ins = max(rl + 10, min(int(r.normal(400, 50)), G - 1))
            p = int(r.integers(0, G - ins))
            frag = g[p : p + ins]
            a1 = frag[:rl].copy()
            a2 = (3 - frag[-rl:])[::-1].copy()
            for s in (a1, a2):
                err = r.random(rl) < 0.01
                s[err] = (s[err] + 1) % 4
            names += [f"p{i}", f"p{i}"]
            seqs += [a1, a2]
        return names, seqs

    # --- 1. device-step microbench -------------------------------------
    try:
        from bwamem_tpu.models.mem import device_align_step  # noqa: F401
        from bench import main_device  # reuse if importable
    except Exception:
        main_device = None
    # (bench.py --device is the canonical path; run it separately)

    # --- 2/3. e2e SE + PE ----------------------------------------------
    for tag, mk, pe in (("se", mk_se, False), ("pe", mk_pe, True)):
        al = MemAligner(MemOptions(), idx)
        run = al.align_pairs_batch if pe else al.align_batch
        for s in (1, 2):
            names, seqs = mk(s)
            run(names, seqs)
        iters = 2 if args.quick else 3
        batches = [mk(3 + i) for i in range(iters)]
        t0 = time.perf_counter()
        for nb in batches:
            run(nb[0], nb[1])
        dt = (time.perf_counter() - t0) / iters
        unit = "pairs/s" if pe else "reads/s"
        val = round((B // 2 if pe else B) / dt, 1)
        emit({"metric": f"e2e_{tag}", "value": val, "unit": unit,
              "batch": B})

    # --- 4. reseed off delta -------------------------------------------
    al = MemAligner(MemOptions(full_reseed=False), idx)
    for s in (1, 2):
        names, seqs = mk_se(s)
        al.align_batch(names, seqs)
    batches = [mk_se(3 + i) for i in range(2)]
    t0 = time.perf_counter()
    for nb in batches:
        al.align_batch(*nb)
    dt = (time.perf_counter() - t0) / 2
    emit({"metric": "e2e_se_noreseed", "value": round(B / dt, 1),
          "unit": "reads/s"})

    # --- 5. extension kernel GCUPS -------------------------------------
    import jax.numpy as jnp

    from bwamem_tpu.ops.extend import ExtendParams
    from bwamem_tpu.ops.pallas.extend_kernel import extend_batch_pallas

    r = np.random.default_rng(3)
    for tag, n, ql_, tl_ in (("dense_150", 8192, 131, 250),
                             ("long_1k", 512, 1000, 1100)):
        Q = r.integers(0, 4, (n, ql_)).astype(np.int32)
        T = r.integers(0, 4, (n, tl_)).astype(np.int32)
        ql = np.full(n, ql_, np.int32)
        tl = np.full(n, tl_, np.int32)
        h0 = np.full(n, 30, np.int32)
        params = ExtendParams(o_del=6, e_del=1, o_ins=6, e_ins=1, w=100,
                              zdrop=100, end_bonus=5, opt_ext=True,
                              max_mat=1, mismatch=4)
        fn = lambda: extend_batch_pallas(jnp.asarray(Q), jnp.asarray(T),
                                         jnp.asarray(ql), jnp.asarray(tl),
                                         jnp.asarray(h0), params)
        sync(fn()["score"])  # compile
        t0 = time.perf_counter()
        sync(fn()["score"])
        dt = time.perf_counter() - t0
        gcups = n * ql_ * tl_ / dt / 1e9
        emit({"metric": f"extend_gcups_{tag}", "value": round(gcups, 1),
              "unit": "GCUPS"})

    # --- 6. forward-scan trip anatomy: gather share vs VPU share -------
    # Times a dependent chain of forward_ext2_batch trips (the seeding
    # scan's per-trip primitive) with (a) realistic random occ2 rows vs
    # (b) all rows pinned to block 0 (cache-resident -> ~zero HBM
    # traffic, identical VPU rank arithmetic). The difference is the HBM
    # gather share of a scan trip; it decides whether the unique-suffix
    # text-coast redesign (DESIGN.md "seeding: unique-suffix coast") can
    # pay: coasting removes gather bytes but NOT the lockstep VPU work.
    import jax

    from bwamem_tpu.index.device import DeviceFMIndex
    from bwamem_tpu.ops import fm as fmops

    fmdev = DeviceFMIndex.from_host(idx)
    P = 2 * B
    TR = 64
    rr = np.random.default_rng(11)
    seqlen = int(2 * G)
    base_rows = jnp.asarray(
        rr.integers(1, seqlen - 200, (TR, P)), fmops.idx_dt(fmdev))
    b1 = jnp.asarray(rr.integers(0, 4, P), jnp.int32)
    b2 = jnp.asarray(rr.integers(0, 4, P), jnp.int32)

    @jax.jit
    def chain(rows_per_trip):
        def trip(dep, t):
            l = rows_per_trip[t] | dep           # serialize on prior trip
            k = l
            s = jnp.full((P,), 4, l.dtype)
            (k1, l1, s1), (k2, l2, s2) = fmops.forward_ext2_batch(
                fmdev, k, l, s, b1, b2)
            dep = jnp.where(s2 < 0, 1, 0).astype(l.dtype)  # runtime-0
            return dep.max() + jnp.zeros((P,), l.dtype), s2.sum()
        _, sums = jax.lax.scan(
            trip, jnp.zeros((P,), base_rows.dtype),
            jnp.arange(TR, dtype=jnp.int32))
        return sums.sum()

    zero_rows = jnp.zeros_like(base_rows)
    for tag, arr in (("hot", base_rows), ("blk0", zero_rows)):
        sync(chain(arr))  # compile + warm
        t0 = time.perf_counter()
        sync(chain(arr))
        dt = time.perf_counter() - t0
        emit({"metric": f"fwdscan_trip_us_{tag}",
              "value": round(dt / TR * 1e6, 1), "unit": "us/trip",
              "lanes": P, "trips": TR})

    print("battery done ->", OUT, file=sys.stderr)


if __name__ == "__main__":
    main()
