"""The flagship model: a fully-on-device alignment step.

`device_align_step` fuses the two offloaded stages of the reference (the
GPUSeed seeding call and the GASAL2 extension launches, reference:
src/fastmap.c:460 + src/bwamem.c:2127) into ONE jittable program:

  reads -> batched SMEM seeding -> best-seed selection -> on-device
  reference-window gathers -> batched left/right ksw-extend -> merged
  alignment coordinates + scores.

This is the "direct extension" fast path (single best seed per read); the
full pipeline in pipeline/aligner.py inserts host chaining/filtering
between the two stages for BWA-parity output. The step is pure device
work, so it is also the unit that parallel/sharded.py maps over a Mesh.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..index.device import DeviceFMIndex
from ..ops.extend import (ExtendParams, end_choice, extend_batch_auto,
                          make_score_matrix)
from ..ops.refgather import gather_window_fast
from ..ops.seeding import SeedConfig, smem_seed_batch


@dataclass(frozen=True)
class AlignStepConfig:
    seed: SeedConfig = SeedConfig()
    ext: ExtendParams = ExtendParams()
    a: int = 1
    b: int = 4
    pen_clip: int = 5
    pad: int = 32   # extra reference bases beyond the unseeded read span


@partial(jax.jit, static_argnames=("cfg",))
def device_align_step(fm: DeviceFMIndex, reads, lens,
                      cfg: AlignStepConfig = AlignStepConfig()):
    """reads: (B, L) int32 codes; lens: (B,).

    Returns per-read dict: score, qb, qe, rb, re, n_seeds plus the raw
    seed arrays. All shapes static; jit/shard_map friendly.
    """
    B, L = reads.shape
    reads = reads.astype(jnp.int32)
    lens = lens.astype(jnp.int32)
    seeds = smem_seed_batch(fm, reads, lens, cfg.seed)

    # best seed per read = longest (ties -> leftmost pool slot), via a
    # segment max over the flat seed pool
    P = seeds["qbeg"].shape[0]
    slen = jnp.where(seeds["valid"], seeds["qend"] - seeds["qbeg"], 0)
    t_ids = jnp.arange(P, dtype=jnp.int32)
    key = slen * P + (P - 1 - t_ids)
    seg = jnp.where(seeds["valid"], seeds["read_id"], B)
    best_key = jax.ops.segment_max(
        key, seg, num_segments=B + 1, indices_are_sorted=True)[:B]
    has_seed = best_key > 0
    best_key = jnp.maximum(best_key, 0)
    best = (P - 1) - (best_key % P)
    take = lambda a: a[best]
    qbeg = jnp.where(has_seed, take(seeds["qbeg"]), 0)
    qend = jnp.where(has_seed, take(seeds["qend"]), 0)
    rbeg = jnp.where(has_seed, take(seeds["rbeg"]), 0)
    seedlen = jnp.where(has_seed, qend - qbeg, 0)

    # left extension: reversed query prefix vs reversed ref window
    PAD = cfg.pad
    TL = L + PAD  # static target window length per side
    lq_len = jnp.where(has_seed, qbeg, 0)
    lt_len = jnp.minimum(rbeg, lq_len + PAD)
    # reversed windows: element j = position (start-1-j)
    offs = jnp.arange(L, dtype=jnp.int32)[None, :]
    lq = jnp.take_along_axis(
        reads, jnp.clip(qbeg[:, None] - 1 - offs, 0, L - 1), axis=1)
    lq = jnp.where(offs < lq_len[:, None], lq, 4)
    lt_offs = jnp.arange(TL, dtype=jnp.int32)[None, :]
    # descending window [rbeg-1 .. rbeg-TL] = ascending window flipped
    lt = gather_window_fast(fm, rbeg - TL, TL)[:, ::-1]
    lt = jnp.where(lt_offs < lt_len[:, None], lt, 4)

    # right extension: query suffix vs forward ref window
    rq_len = jnp.where(has_seed, lens - qend, 0)
    rq = jnp.take_along_axis(
        reads, jnp.clip(qend[:, None] + offs, 0, L - 1), axis=1)
    rq = jnp.where(offs < rq_len[:, None], rq, 4)
    rt_end_cap = 2 * fm.l_pac
    rt_len = jnp.minimum(rq_len + PAD, rt_end_cap - (rbeg + seedlen))
    rt = gather_window_fast(fm, rbeg + seedlen, TL)
    rt = jnp.where(lt_offs < rt_len[:, None], rt, 4)

    mat = jnp.asarray(make_score_matrix(cfg.a, cfg.b))
    h0 = jnp.maximum(seedlen * cfg.a, 1)

    # ONE batched extension call for both sides: halves the dispatch's
    # fixed sort/pad/launch cost vs per-side calls
    q2 = jnp.concatenate([lq, rq])
    t2 = jnp.concatenate([lt, rt])
    ql2 = jnp.concatenate([lq_len, rq_len])
    tl2 = jnp.concatenate([lt_len, rt_len])
    h02 = jnp.concatenate([h0, h0])
    out = extend_batch_auto(q2, t2, ql2, tl2, h02, mat, cfg.ext)
    sc2, qe2, te2 = end_choice(out["score"], out["qle"], out["tle"],
                               out["gscore"], out["gtle"], ql2,
                               cfg.pen_clip)
    lsc, rsc = sc2[:B], sc2[B:]
    lqe, rqe = qe2[:B], qe2[B:]
    lte, rte = te2[:B], te2[B:]

    two_sided = jnp.logical_and(lq_len > 0, rq_len > 0)
    score = jnp.where(
        lq_len > 0, lsc, 0) + jnp.where(rq_len > 0, rsc, 0) \
        - jnp.where(two_sided, seedlen * cfg.a, 0)
    score = jnp.where(
        jnp.logical_and(lq_len == 0, rq_len == 0),
        seedlen * cfg.a, score)
    score = jnp.where(has_seed, score, -1)
    lqe = jnp.where(lq_len > 0, lqe, 0)
    lte = jnp.where(lq_len > 0, lte, 0)
    rqe = jnp.where(rq_len > 0, rqe, 0)
    rte = jnp.where(rq_len > 0, rte, 0)
    return dict(
        score=score,
        qb=qbeg - lqe,
        qe=qend + rqe,
        rb=rbeg - lte,
        re=rbeg + seedlen + rte,
        has_seed=has_seed,
        n_seeds=seeds["n_seeds"],
    )
