"""Pallas TPU kernel for batched local Smith-Waterman (ksw_align2).

The mate-rescue kernel (semantics contract: ops/swalign.py, which ports
the reference's SSE striped local SW — reference: src/ksw.c:355-612
ksw_u8/ksw_i16/ksw_align2, driven by mem_matesw at
src/bwamem_pair.c:119-159). The lax.scan twin keeps its (N, QMAX)
carries in HBM between target rows; this kernel holds a tile's whole DP
state in VMEM and sweeps rows with pure VPU work, the same architecture
as ops/pallas/extend_kernel.py:

  * one tile = TILE alignments (sublanes) x QP query columns (lanes);
  * the intra-row F recurrence closes with a log-step prefix max
    (exact for affine gaps: re-opening inside a gap never beats
    extending it);
  * per-row best/(qe, te) trackers are (TILE, 1) vectors; tie rules
    match ksw_align2 — strict > on the row max (earliest target row
    wins, reference src/ksw.c:457), earliest query column in the row;
  * the forward pass also emits the per-target-row maxima needed by the
    KSW_XSUBO second-best rule (reference src/ksw.c:472-489,568-575);
    the window mask around the final (best, te) is applied by the
    caller in plain XLA;
  * start coordinates come from a second kernel sweep over the reversed
    prefixes (ksw_align2's second call, reference src/ksw.c:594-610).

Scoring is the bwa matrix form (match a, mismatch -b, anything vs N =
-1) — the only form the rescue path ever uses (bwa_fill_scmat,
reference src/bwa.c:99).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as _np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .extend_kernel import NEG, _prefix_max_exclusive, _shift_lanes

SW_STACK_KEYS = ("score", "qb", "qe", "tb", "te", "score2")


def _make_sw_kernel(QP, TMAX, a, b, o_del, e_del, o_ins, e_ins,
                    want_rowmax):
    # pin closure scalars to int32 (x64 promotion breaks Mosaic lowering)
    a, b = _np.int32(a), _np.int32(b)
    o_del, e_del = _np.int32(o_del), _np.int32(e_del)
    o_ins, e_ins = _np.int32(o_ins), _np.int32(e_ins)
    oe_del = _np.int32(o_del + e_del)

    def kernel(q_ref, t_ref, meta_ref, out_ref, *rmax_ref):
        TILE = q_ref.shape[0]
        u = jax.lax.broadcasted_iota(jnp.int32, (TILE, QP), 1)
        qlen = meta_ref[:, 0:1]
        tlen = meta_ref[:, 1:2]
        qmask = u < jnp.broadcast_to(qlen, (TILE, QP))
        q = q_ref[:]
        t_all = t_ref[:]
        t_lane = jax.lax.broadcasted_iota(jnp.int32, t_all.shape, 1)
        eu = u * e_ins

        def row(i, carry):
            H, E, best, qe, te, rm_acc = carry
            active = i < tlen  # (TILE, 1)
            # column i of the target via masked reduction (dynamic lane
            # slices are not supported by Mosaic)
            tchar = jnp.max(jnp.where(t_lane == i, t_all, -1), axis=1,
                            keepdims=True)
            tcharf = jnp.broadcast_to(tchar, (TILE, QP))
            S = jnp.where(q == tcharf, a, _np.int32(-b))
            S = jnp.where(jnp.logical_or(q > 3, tcharf > 3),
                          jnp.int32(-1), S)
            # M(u) = H(i-1, u-1) + S; H(i-1, -1) = 0
            Hd = _shift_lanes(H, 1, jnp.int32(0))
            M = Hd + S
            # E(i) from the FULL previous-row H (deletion), clamped >= 0
            Ec = jnp.maximum(jnp.maximum(E - e_del, H - oe_del), 0)
            Hp = jnp.maximum(jnp.maximum(M, Ec), 0)
            Hp = jnp.where(qmask, Hp, 0)
            # F(u) = max_{u'<u}(Hp(u') - o_ins - e_ins*(u-u'))
            G = Hp + eu
            F = _prefix_max_exclusive(G, QP, NEG) - eu - o_ins
            Hn = jnp.maximum(Hp, jnp.maximum(F, 0))
            Hn = jnp.where(qmask, Hn, 0)
            # one packed-key reduction gives the row max AND its
            # EARLIEST column: key = (Hn+1)*QP + (QP-1-u), so equal
            # scores prefer the smaller u (reference takes the first
            # column achieving the row max)
            key = jnp.max((Hn + 1) * QP + (QP - 1 - u), axis=1,
                          keepdims=True)
            rowmax = key // QP - 1
            rj = (QP - 1) - key % QP
            upd = jnp.logical_and(active, rowmax > best)
            best = jnp.where(upd, rowmax, best)
            qe = jnp.where(upd, rj, qe)
            te = jnp.where(upd, i, te)
            if want_rowmax:
                rm_row = jnp.where(active, rowmax, 0)
                rm_acc = jnp.where(
                    t_lane == i,
                    jnp.broadcast_to(rm_row, t_all.shape), rm_acc)
            actf = jnp.broadcast_to(active, (TILE, QP))
            H = jnp.where(actf, Hn, H)
            E = jnp.where(actf, Ec, E)
            return (H, E, best, qe, te, rm_acc)

        z1 = jnp.zeros((TILE, 1), jnp.int32)
        neg1 = jnp.full((TILE, 1), -1, jnp.int32)
        # DATA-DERIVED zero inits: a splat-constant (TILE, QP) carry gets
        # a lane-replicated Mosaic layout while the loop body produces
        # materialized vectors — the resulting relayout is rejected
        # ("Non-singleton logical dimension is replicated in destination
        # but not in source"). Deriving the zeros from input data (codes
        # are always <= 4, so the predicate is never true) pins a
        # materialized layout from iteration 0.
        zq = jnp.where(q > 9, q, 0)
        rm0 = jnp.where(t_all > 9, t_all, 0) if want_rowmax else z1
        init = (zq, zq, z1, neg1, neg1, rm0)
        # dynamic trip count: the tile only runs to its own longest
        # target (callers sort jobs by tlen so tiles are length-coherent)
        tl_max = jnp.minimum(jnp.max(meta_ref[:, 1]), TMAX)

        def _cond(c):
            i, _ = c
            return i < tl_max

        def _body(c):
            i, st = c
            return i + 1, row(i, st)

        _, (_, _, best, qe, te, rm) = jax.lax.while_loop(
            _cond, _body, (jnp.int32(0), init))
        out_ref[:] = jnp.concatenate(
            [best, qe, te, z1, z1, z1, z1, z1], axis=1)
        if want_rowmax:
            rmax_ref[0][:] = rm

    return kernel


def _auto_tile(QP, TMAX, want_rowmax):
    # fit the tile's DP state in scoped VMEM: ~10 live (TILE, QP) int32
    # buffers + (2 or 3) (TILE, TMAX) buffers (target, lane iota, rowmax)
    row_bytes = 4 * (10 * QP + (3 if want_rowmax else 2) * TMAX)
    t = 256
    while t > 8 and t * row_bytes > 12 * 1024 * 1024:
        t //= 2
    return t


@partial(jax.jit,
         static_argnames=("params_tuple", "tile", "want_rowmax",
                          "interpret"))
def _sw_pallas_impl(query, target, meta, params_tuple, tile, want_rowmax,
                    interpret):
    a, b, o_del, e_del, o_ins, e_ins = params_tuple
    N, QP = query.shape
    TMAX = target.shape[1]
    kernel = _make_sw_kernel(QP, TMAX, a, b, o_del, e_del, o_ins, e_ins,
                             want_rowmax)
    grid = (N // tile,)
    out_shapes = [jax.ShapeDtypeStruct((N, 8), jnp.int32)]
    out_specs = [pl.BlockSpec((tile, 8), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    if want_rowmax:
        out_shapes.append(jax.ShapeDtypeStruct((N, TMAX), jnp.int32))
        out_specs.append(pl.BlockSpec((tile, TMAX), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
    # trace with x64 OFF: the kernel is int32 throughout and Mosaic's
    # int64 convert lowering recurses on x64 index arithmetic
    with jax.enable_x64(False):
        res = pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile, QP), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, TMAX), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 8), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
            interpret=interpret,
        )(query, target, meta)
    return res if want_rowmax else (res[0], None)


@partial(jax.jit,
         static_argnames=("o_del", "e_del", "o_ins", "e_ins", "a", "b",
                          "rev_skip", "tile", "interpret"))
def sw_align_batch_pallas_stacked(query, target, qlen, tlen, minsc,
                                  a: int, b: int,
                                  o_del: int, e_del: int,
                                  o_ins: int, e_ins: int,
                                  rev_skip: int = 0,
                                  tile: int | None = None,
                                  interpret: bool = False):
    """Batched ksw_align2 on the Pallas kernel. Returns one (6, N) int32
    array in SW_STACK_KEYS order (= ops.swalign.SW_KEYS): score, qb, qe,
    tb, te (inclusive 0-based ends; -1 when score == 0) and score2.
    Bit-identical to ops.swalign.sw_align_batch with the bwa matrix
    form mat[i][j] = a if i==j else -b (N rows/cols = -1).

    rev_skip > 0: lanes with forward score < rev_skip skip the reverse
    (start-coordinate) sweep and report qb = tb = -1 — exact for
    callers that reject sub-threshold hits anyway (mate rescue rejects
    score < min_seed_len before reading qb; reference
    src/bwamem_pair.c:156). Most rescue probes miss, so this halves the
    DP for the common case."""
    N, QMAX = query.shape
    query = query.astype(jnp.int32)
    target = target.astype(jnp.int32)
    qlen = qlen.astype(jnp.int32)
    tlen = tlen.astype(jnp.int32)
    minsc = minsc.astype(jnp.int32)

    # sort jobs by tlen so tiles are length-coherent (per-tile dynamic
    # trip count pays off), pad the batch to a tile multiple
    order = jnp.argsort(tlen)
    inv = jnp.argsort(order)
    query, target = query[order], target[order]
    qlen, tlen, minsc = qlen[order], tlen[order], minsc[order]

    QP = -(-QMAX // 128) * 128
    TMAX = -(-target.shape[1] // 128) * 128
    if tile is None:
        tile = _auto_tile(QP, TMAX, True)
    Np = -(-N // tile) * tile
    qs = jnp.full((Np, QP), 4, jnp.int32).at[:N, :QMAX].set(query)
    ts = jnp.full((Np, TMAX), 4, jnp.int32
                  ).at[:N, : target.shape[1]].set(target)
    meta = jnp.zeros((Np, 8), jnp.int32)
    meta = meta.at[:N, 0].set(qlen)
    meta = meta.at[:N, 1].set(tlen)
    pt = (a, b, o_del, e_del, o_ins, e_ins)
    out, rowmax = _sw_pallas_impl(qs, ts, meta, pt, tile, True, interpret)
    best, qe, te = out[:N, 0], out[:N, 1], out[:N, 2]
    rowmax = rowmax[:N]

    # score2: best row max outside te +- ceil(best / a), rows >= minsc
    t_ids = jnp.arange(TMAX, dtype=jnp.int32)
    halfw = (best + a - 1) // a
    outside = jnp.logical_or(t_ids[None, :] < (te - halfw)[:, None],
                             t_ids[None, :] > (te + halfw)[:, None])
    ok = jnp.logical_and(outside, rowmax >= minsc[:N, None])
    score2 = jnp.max(jnp.where(ok, rowmax, 0), axis=1)

    # reverse pass over reversed prefixes query[:qe+1], target[:te+1]
    live = best >= rev_skip if rev_skip > 0 \
        else jnp.ones_like(best, bool)
    rqlen = jnp.where(live, jnp.maximum(qe + 1, 0), 0)
    rtlen = jnp.where(live, jnp.maximum(te + 1, 0), 0)
    qg = qe[:, None] - jnp.arange(QP, dtype=jnp.int32)[None, :]
    tg = te[:, None] - jnp.arange(TMAX, dtype=jnp.int32)[None, :]
    rquery = jnp.take_along_axis(qs[:N], jnp.clip(qg, 0, QP - 1), axis=1)
    rtarget = jnp.take_along_axis(ts[:N], jnp.clip(tg, 0, TMAX - 1),
                                  axis=1)
    # the reverse sweep gets its own tlen sort: reverse lengths follow
    # te (+ the rev_skip zeros), not the forward sort order
    order2 = jnp.argsort(rtlen)
    inv2 = jnp.argsort(order2)
    rqs = jnp.full((Np, QP), 4, jnp.int32).at[:N].set(rquery[order2])
    rts = jnp.full((Np, TMAX), 4, jnp.int32).at[:N].set(rtarget[order2])
    rmeta = jnp.zeros((Np, 8), jnp.int32)
    rmeta = rmeta.at[:N, 0].set(rqlen[order2])
    rmeta = rmeta.at[:N, 1].set(rtlen[order2])
    rout, _ = _sw_pallas_impl(rqs, rts, rmeta, pt, tile, False, interpret)
    rbest = rout[:N, 0][inv2]
    rqe = rout[:N, 1][inv2]
    rte = rout[:N, 2][inv2]
    good = jnp.logical_and(live, rbest == best)
    qb = jnp.where(good, qe - rqe, -1)
    tb = jnp.where(good, te - rte, -1)
    stacked = jnp.stack([best, qb, qe, tb, te, score2])
    return stacked[:, inv]
