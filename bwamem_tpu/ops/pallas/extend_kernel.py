"""Pallas TPU kernel for batched ksw-extend.

The GASAL2-role kernel (semantics contract: decoy_cpu_align /
ksw_extend2, see ops/extend.py). The lax.scan formulation keeps its
(N, QMAX) carries in HBM between rows; this kernel holds the whole DP
state for a tile of alignments in VMEM and loops over target rows with
pure VPU work:

  * one tile = TILE alignments (sublanes) x QP columns (lanes);
  * the intra-row F recurrence is closed with a log-step prefix max
    (shift-mask-max passes) instead of a sequential column loop;
  * per-row best/gscore trackers are (TILE, 1) vectors in the loop carry;
  * the per-lane H(i, qlen) read (gscore) is a masked reduction, avoiding
    per-sublane dynamic gathers.

Scoring is the bwa matrix form (match a, mismatch -b, anything vs N = -1),
which avoids a 25-entry gather per cell.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -0x40000000  # plain int: jnp scalars become captured consts in Pallas
NEG16 = -16384     # sentinel for the int16 DP variant


def _shift_lanes(x, d, fill):
    """x shifted right by d lanes, left-filled with `fill` (static d).
    Static slice + concat instead of pltpu.roll+where: one op fewer per
    step, and it lowers for int16 (Mosaic has no 16-bit lane rotate)."""
    pad = jnp.full((x.shape[0], d), fill, x.dtype)
    return jnp.concatenate([pad, x[:, :-d]], axis=1)


def _prefix_max_exclusive(x, width, neg):
    """Exclusive running max along the lane axis (column j gets
    max(x[:, :j]), neg for j=0). width = static number of columns."""
    neg = x.dtype.type(neg)
    acc = _shift_lanes(x, 1, neg)  # exclusive
    d = 1
    while d < width:
        acc = jnp.maximum(acc, _shift_lanes(acc, d, neg))
        d <<= 1
    return acc


def _make_kernel(QP, TMAX, a, b, o_del, e_del, o_ins, e_ins, w, zdrop,
                 end_bonus, opt_ext, use_i16):
    # pin all closure scalars to int32: with jax_enable_x64 on, Python ints
    # promote to int64, which Mosaic cannot lower (and trips a promotion
    # recursion); the DP itself is int32 throughout
    import numpy as _np

    a, b = _np.int32(a), _np.int32(b)
    o_del, e_del = _np.int32(o_del), _np.int32(e_del)
    o_ins, e_ins = _np.int32(o_ins), _np.int32(e_ins)
    w, zdrop = _np.int32(w), _np.int32(zdrop)
    end_bonus = _np.int32(end_bonus)
    oe_del = _np.int32(o_del + e_del)
    oe_ins = _np.int32(o_ins + e_ins)

    # DP dtype: int16 when scores provably fit (2x VPU lanes per op);
    # trackers that hold column/row indices stay int32
    dp = jnp.int16 if use_i16 else jnp.int32
    neg = NEG16 if use_i16 else NEG
    QP2 = QP  # packed-key radix for the fused (rowmax, mj) reduction

    def kernel(q_ref, t_ref, meta_ref, out_ref):
        # q_ref: (TILE, QP) query codes (dp dtype) at columns u>=1
        # t_ref: (TILE, TMAX); meta_ref: (TILE, 8) [qlen, tlen, h0, ...]
        TILE = q_ref.shape[0]
        # Mosaic 16-bit gaps shape this code: no int16 reductions, no
        # 16-bit lane rotate/broadcast, no i1 relayout between the 32-bit
        # and 16-bit mask layouts. So: (TILE, QP) masks selecting dp
        # values are built from a dp iota / full dp operands; per-row
        # (TILE, 1) scalars are broadcast in int32 (supported) and then
        # value-converted; all (TILE, 1) trackers stay int32.
        u = jax.lax.broadcasted_iota(jnp.int32, (TILE, QP), 1)
        ud = u.astype(dp)  # no 16-bit iota in hardware; converted once
        qlen = meta_ref[:, 0:1]
        tlen = meta_ref[:, 1:2]
        h0 = meta_ref[:, 2:3]

        def bcast_d(x):
            """(TILE, 1) int32 -> (TILE, QP) dp, via int32 broadcast."""
            return jnp.broadcast_to(x, (TILE, QP)).astype(dp)

        h0f = bcast_d(h0)
        qlenf = bcast_d(qlen)

        q = q_ref[:]
        qmask_d = jnp.logical_and(ud >= 1, ud <= qlenf)

        max_ins = jnp.maximum((qlen * a + end_bonus - o_ins) // e_ins + 1, 1)
        max_del = jnp.maximum((qlen * a + end_bonus - o_del) // e_del + 1, 1)
        w_lane = jnp.minimum(jnp.minimum(max_ins, max_del), w)

        eu = ud * dp(e_ins)                  # e_ins * u, precomputed
        H0 = jnp.maximum(h0f - dp(o_ins) - eu, 0)
        H0 = jnp.where(ud == 0, h0f, H0)
        H0 = jnp.where(ud <= qlenf, H0, dp(0))

        t_all = t_ref[:]
        t_lane = jax.lax.broadcasted_iota(jnp.int32, t_all.shape, 1)

        def row(i, carry):
            (H, E, best, qle, tle, gscore, gtle, moff, dead_i) = carry
            dead = dead_i > 0
            # column i extracted by masked reduction (dynamic lane slices
            # are not supported by Mosaic)
            tchar = jnp.max(jnp.where(t_lane == i, t_all, -1), axis=1,
                            keepdims=True)
            tcharf = bcast_d(tchar)
            active = jnp.logical_and(jnp.logical_not(dead), i < tlen)

            # score of q[u-1] vs tchar at columns u >= 1
            S = jnp.where(q == tcharf, dp(a), dp(-b))
            S = jnp.where(jnp.logical_or(q > 3, tcharf > 3), dp(-1), S)

            Hd = _shift_lanes(H, 1, dp(0))  # H(i-1, u-1) at column u
            M = jnp.where(Hd > 0, Hd + S, dp(0))

            if opt_ext:
                j = ud - 1
                lo_f = bcast_d(i - w_lane)
                hi_f = bcast_d(i + w_lane + 1)
                in_band = jnp.logical_and(j >= lo_f, j < hi_f)
                live = jnp.logical_and(
                    jnp.logical_or(in_band, ud == 0), qmask_d)
                Mx = jnp.where(live, M, dp(0))
                Ex = jnp.where(live, E, dp(0))
            else:
                # unbanded: the live region is the lane prefix 1..qlen and
                # out-of-prefix pollution only drifts rightward through Hd
                # (never back into live lanes) and is masked out of every
                # reduction below — so M/E need no per-lane masking here,
                # and the column-0 M is already killed by the shift fill
                live = qmask_d
                Mx = M
                Ex = E

            t_ins = jnp.maximum(Mx - dp(oe_ins), 0)
            G = jnp.where(ud == 0, dp(neg), t_ins + eu)
            F = _prefix_max_exclusive(G, QP, neg) - eu + dp(e_ins)
            F = jnp.maximum(F, 0)
            if opt_ext:
                F = jnp.where(live, F, dp(0))

            Hn = jnp.maximum(jnp.maximum(Mx, Ex), F)
            b0 = jnp.maximum(h0 - (o_del + e_del * (i + 1)), 0)
            Hn = jnp.where(ud == 0, bcast_d(b0), Hn)

            # En needs no masking in either mode: masked/zero M and E give
            # max(-e, -oe, 0) = 0 at dead lanes automatically
            En = jnp.maximum(Ex - dp(e_del),
                             jnp.maximum(Mx - dp(oe_del), 0))

            # one packed-key reduction yields the row max AND its column:
            # key = (Hn + 1) << 9 | u; ties pick the largest u (the
            # reference's mj). Values fit: Hn < 2^21 for any real read.
            Ht32 = jnp.where(jnp.logical_and(live, ud >= 1), Hn,
                             dp(-1)).astype(jnp.int32)
            key = jnp.max((Ht32 + 1) * QP2 + u, axis=1, keepdims=True)
            rowmax = key // QP2 - 1
            mj = jnp.where(rowmax >= 0, key % QP2, -1)

            He32 = jnp.where(ud == qlenf, Hn, dp(neg)).astype(jnp.int32)
            h_end = jnp.max(He32, axis=1, keepdims=True)
            g_upd = jnp.logical_and(active, h_end >= gscore)
            if opt_ext:
                g_upd = jnp.logical_and(g_upd, i + w_lane + 1 >= qlen)
            gscore = jnp.where(g_upd, h_end, gscore)
            gtle = jnp.where(g_upd, i + 1, gtle)

            b_upd = jnp.logical_and(active, rowmax > best)
            best = jnp.where(b_upd, rowmax, best)
            qle = jnp.where(b_upd, mj, qle)
            tle = jnp.where(b_upd, i + 1, tle)
            moff = jnp.where(
                b_upd, jnp.maximum(moff, jnp.abs(mj - 1 - i)), moff)

            dead = jnp.logical_or(
                dead, jnp.logical_and(active, rowmax == 0))
            if zdrop > 0:
                di = i - (tle - 1)
                dj = (mj - 1) - (qle - 1)
                # int32-valued select, compared after: a bool-valued
                # where lowers through an i8 vector and Mosaic rejects
                # the i8->i1 trunci on this target
                zgap = jnp.where(di > dj, (di - dj) * e_del,
                                 (dj - di) * e_ins)
                zd = best - rowmax - zgap > zdrop
                dead = jnp.logical_or(
                    dead,
                    jnp.logical_and(
                        jnp.logical_and(active, jnp.logical_not(b_upd)),
                        zd),
                )
            dead = jnp.logical_or(dead, i + 1 >= tlen)

            actf = bcast_d(active.astype(jnp.int32))
            H = jnp.where(actf > 0, Hn, H)
            E = jnp.where(actf > 0, En, E)
            return (H, E, best, qle, tle, gscore, gtle, moff,
                    dead.astype(jnp.int32))

        z = jnp.zeros((TILE, 1), jnp.int32)
        init = (
            H0, jnp.zeros((TILE, QP), dp),
            h0, z, z,
            jnp.full((TILE, 1), -1, jnp.int32), z, z,
            (tlen <= 0).astype(jnp.int32),
        )
        # dynamic trip count: this tile only runs to its own longest target
        # (callers sort jobs by tlen so tiles are length-coherent), and
        # stops as soon as every lane is dead — exact, because row(i) is a
        # no-op for dead/finished lanes
        tl_max = jnp.minimum(jnp.max(meta_ref[:, 1]), TMAX)

        def _cond(c):
            i, st = c
            return jnp.logical_and(i < tl_max, jnp.min(st[8]) < 1)

        def _body(c):
            i, st = c
            return i + 1, row(i, st)

        _, (_, _, best, qle, tle, gscore, gtle, moff, _) = \
            jax.lax.while_loop(_cond, _body, (jnp.int32(0), init))
        out = jnp.concatenate(
            [best.astype(jnp.int32), qle, tle, gscore.astype(jnp.int32),
             gtle, moff, z, z], axis=1)
        out_ref[:] = out

    return kernel


@partial(jax.jit, static_argnames=("params_tuple", "tile", "interpret"))
def _extend_pallas_impl(query, target, meta, params_tuple, tile, interpret):
    (a, b, o_del, e_del, o_ins, e_ins, w, zdrop, end_bonus, opt_ext) = \
        params_tuple
    N, QP = query.shape
    TMAX = target.shape[1]
    # int16 DP when every reachable score/intermediate provably fits:
    # |values| <= a*QP + max h0 (<= a*QP) + gap terms (<= e*QP), and the
    # NEG16 sentinel region stays clear of wraparound
    # int16 DP would halve VPU op cost, but the target rejects 16-bit
    # compares ("Target does not support this comparison") as well as
    # 16-bit rotates/iotas/reductions — the dp plumbing below is kept for
    # hardware/Mosaic versions that support it
    use_i16 = False
    if use_i16:
        query = query.astype(jnp.int16)
    kernel = _make_kernel(QP, TMAX, a, b, o_del, e_del, o_ins, e_ins, w,
                          zdrop, end_bonus, opt_ext, use_i16)
    grid = (N // tile,)
    # trace the pallas_call with x64 OFF: the kernel is int32 throughout,
    # and Mosaic's int64 convert lowering recurses on x64 index arithmetic
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, 8), jnp.int32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile, QP), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, TMAX), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 8), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, 8), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(query, target, meta)
    return out


def extend_batch_pallas(query, target, qlen, tlen, h0, params, *,
                        tile: int | None = None,
                        interpret: bool | None = None):
    """Same contract as ops.extend.extend_batch but on the Pallas kernel.

    query: (N, QMAX) codes; the kernel wants the query shifted to columns
    u >= 1 and padded to a lane multiple — handled here. Scoring uses the
    bwa matrix form via params.max_mat (a) and the mismatch penalty
    derived from it; callers with exotic matrices should use the lax path.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    N, QMAX = query.shape

    def auto_tile(qmax_eff, tmax):
        if tile is not None:
            return tile
        # fit the tile's DP state in scoped VMEM (~16 MB): ~10 live
        # (TILE, QP) int32 buffers + 2 (TILE, TMAX) buffers
        QP_ = -(-(qmax_eff + 1) // 128) * 128
        TM_ = -(-tmax // 128) * 128
        row_bytes = 4 * (10 * QP_ + 2 * TM_)
        t = 256
        while t > 8 and t * row_bytes > 12 * 1024 * 1024:
            t //= 2
        return t

    QSMALL = 126  # largest qlen that fits a 128-lane DP row
    bucketed = QMAX > QSMALL and N >= 512
    # sort jobs by (qlen bucket, tlen): tiles see similar tlen so the
    # per-tile dynamic trip count pays off, and with bucketing the
    # narrow-query jobs run in a half-width (QP=128) kernel while their
    # tiles in the wide call are born dead (tlen forced 0) and exit
    # immediately — lane utilisation for short extensions roughly doubles
    key = tlen.astype(jnp.int32)
    if bucketed:
        key = key + jnp.where(qlen.astype(jnp.int32) > QSMALL,
                              jnp.int32(1 << 20), 0)
    order = jnp.argsort(key)
    inv = jnp.argsort(order)
    query = query[order]
    target = target[order]
    qlen = qlen[order]
    tlen = tlen[order]
    h0 = h0[order]
    QP = -(-(QMAX + 1) // 128) * 128
    TMAX = -(-target.shape[1] // 128) * 128
    tile_w = auto_tile(QMAX, TMAX)
    Np = -(-N // tile_w) * tile_w
    qs = jnp.full((Np, QP), 4, jnp.int32)
    qs = qs.at[:N, 1 : QMAX + 1].set(query.astype(jnp.int32))
    ts = jnp.full((Np, TMAX), 4, jnp.int32)
    ts = ts.at[:N, : target.shape[1]].set(target.astype(jnp.int32))
    meta = jnp.zeros((Np, 8), jnp.int32)
    meta = meta.at[:N, 0].set(qlen.astype(jnp.int32))
    meta = meta.at[:N, 1].set(tlen.astype(jnp.int32))
    meta = meta.at[:N, 2].set(h0.astype(jnp.int32))
    p = params
    pt = (p.max_mat, _mismatch_from(p), p.o_del, p.e_del, p.o_ins, p.e_ins,
          p.w, p.zdrop, p.end_bonus, p.opt_ext)
    if bucketed:
        small = meta[:, 0] <= QSMALL
        metaA = meta.at[:, 1].set(jnp.where(small, meta[:, 1], 0))
        metaB = meta.at[:, 1].set(jnp.where(small, 0, meta[:, 1]))
        tile_a = auto_tile(QSMALL, TMAX)
        Npa = -(-Np // tile_a) * tile_a
        qsA = jnp.full((Npa, 128), 4, jnp.int32)
        qsA = qsA.at[:Np, : QSMALL + 1].set(qs[:, : QSMALL + 1])
        tsA = jnp.full((Npa, TMAX), 4, jnp.int32).at[:Np].set(ts)
        mA = jnp.zeros((Npa, 8), jnp.int32).at[:Np].set(metaA)
        outA = _extend_pallas_impl(qsA, tsA, mA, pt, tile_a, interpret)[:Np]
        outB = _extend_pallas_impl(qs, ts, metaB, pt, tile_w, interpret)
        out = jnp.where(small[:, None], outA, outB)[:N][inv]
    else:
        out = _extend_pallas_impl(qs, ts, meta, pt, tile_w, interpret)[:N][inv]
    return dict(score=out[:, 0], qle=out[:, 1], tle=out[:, 2],
                gscore=out[:, 3], gtle=out[:, 4], max_off=out[:, 5])


# the mismatch penalty is carried on ExtendParams via the score matrix the
# caller built; default bwa form is (a=1, b=4)
def _mismatch_from(params):
    return getattr(params, "mismatch", 4)
