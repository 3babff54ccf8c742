"""Data-parallel scaling harness (BASELINE config 5's shape).

Measures the sharded full alignment step over a 1..N-device mesh and
reports scaling efficiency. On this container only ONE real TPU chip is
reachable, so by default this runs on a virtual CPU mesh
(xla_force_host_platform_device_count) — that validates the sharding
program and the harness, NOT real ICI bandwidth; on a real pod slice the
same script measures true multi-chip efficiency.

Prints one JSON line per mesh size:
  {"devices": N, "reads_per_s": ..., "efficiency_vs_1": ...}
"""
from __future__ import annotations

import json
import os
import sys
import time

if "--real" not in sys.argv and os.environ.get("JAX_PLATFORMS") != "cpu":
    # jax is preloaded at interpreter start in this image (a .pth hook),
    # so env vars set here are too late — re-exec with the right env
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

import numpy as np  # noqa: E402


def main() -> None:
    import jax

    if "--real" not in sys.argv:
        # env alone loses to the axon plugin (see tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")

    from bwamem_tpu.index.build import build_index_from_codes
    from bwamem_tpu.index.device import DeviceFMIndex
    from bwamem_tpu.index.format import Annotation
    from bwamem_tpu.models.mem import AlignStepConfig
    from bwamem_tpu.parallel.sharded import (make_mesh, replicate_index,
                                             shard_reads,
                                             sharded_align_step)

    rng = np.random.default_rng(7)
    G = 1_000_000
    B = 4096
    RL = 150
    g = rng.integers(0, 4, G, dtype=np.uint8)
    ann = Annotation(names=["ref"], lengths=[G], offsets=[0])
    idx = build_index_from_codes(g, ann, sa_intv=8)
    fm = DeviceFMIndex.from_host(idx)
    pos = rng.integers(0, G - RL, B)
    reads = np.empty((B, RL), np.int32)
    for i in range(B):
        r = g[pos[i] : pos[i] + RL].copy()
        err = rng.random(RL) < 0.01
        r[err] = (r[err] + 1) % 4
        reads[i] = r
    lens = np.full(B, RL, np.int32)

    n_avail = len(jax.devices())
    base = None
    for n in [x for x in (1, 2, 4, 8) if x <= n_avail]:
        mesh = make_mesh(n)
        fm_r = replicate_index(mesh, fm)
        r_sh, l_sh, _ = shard_reads(mesh, reads, lens)
        step = sharded_align_step(mesh, AlignStepConfig(), gather_out=False)
        out, _ = step(fm_r, r_sh, l_sh)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out, _ = step(fm_r, r_sh, l_sh)
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 3
        rps = B / dt
        if base is None:
            base = rps
        print(json.dumps({
            "devices": n,
            "reads_per_s": round(rps, 1),
            "efficiency_vs_1": round(rps / (base * n), 3),
            "backend": jax.default_backend(),
        }))


if __name__ == "__main__":
    main()
