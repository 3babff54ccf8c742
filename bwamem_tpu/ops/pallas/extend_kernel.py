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


def _prefix_max_exclusive(x, width):
    """Exclusive running max along the lane axis (column j gets
    max(x[:, :j]), NEG for j=0). width = static number of columns."""
    u = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    # shift right by 1 (exclusive), then log-step accumulation
    acc = jnp.where(u >= 1, pltpu.roll(x, 1, axis=1), NEG)
    d = 1
    while d < width:
        shifted = jnp.where(u >= d, pltpu.roll(acc, d, axis=1), NEG)
        acc = jnp.maximum(acc, shifted)
        d <<= 1
    return acc


def _make_kernel(QP, TMAX, a, b, o_del, e_del, o_ins, e_ins, w, zdrop,
                 end_bonus, opt_ext):
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

    def kernel(q_ref, t_ref, meta_ref, out_ref):
        # q_ref: (TILE, QP) query codes at columns u>=1 (col u holds q[u-1])
        # t_ref: (TILE, TMAX); meta_ref: (TILE, 8) [qlen, tlen, h0, ...]
        TILE = q_ref.shape[0]
        u = jax.lax.broadcasted_iota(jnp.int32, (TILE, QP), 1)
        qlen = meta_ref[:, 0:1]
        tlen = meta_ref[:, 1:2]
        h0 = meta_ref[:, 2:3]

        q = q_ref[:]
        qmask = jnp.logical_and(u >= 1, u <= qlen)

        max_ins = jnp.maximum((qlen * a + end_bonus - o_ins) // e_ins + 1, 1)
        max_del = jnp.maximum((qlen * a + end_bonus - o_del) // e_del + 1, 1)
        w_lane = jnp.minimum(jnp.minimum(max_ins, max_del), w)

        H0 = jnp.maximum(h0 - o_ins - e_ins * u, 0)
        H0 = jnp.where(u == 0, h0, H0)
        H0 = jnp.where(u <= qlen, H0, 0)

        t_all = t_ref[:]
        t_lane = jax.lax.broadcasted_iota(jnp.int32, t_all.shape, 1)

        def row(i, carry):
            (H, E, best, qle, tle, gscore, gtle, moff, dead_i) = carry
            dead = dead_i > 0
            # column i extracted by masked reduction (dynamic lane slices
            # are not supported by Mosaic)
            tchar = jnp.max(jnp.where(t_lane == i, t_all, -1), axis=1,
                            keepdims=True)
            active = jnp.logical_and(jnp.logical_not(dead), i < tlen)

            # score of q[u-1] vs tchar at columns u >= 1
            S = jnp.where(q == tchar, jnp.int32(a), jnp.int32(-b))
            S = jnp.where(
                jnp.logical_or(q > 3, tchar > 3), jnp.int32(-1), S)

            Hd = pltpu.roll(H, 1, axis=1)  # H(i-1, u-1) at column u
            M = jnp.where(Hd > 0, Hd + S, 0)
            M = jnp.where(u == 0, 0, M)

            if opt_ext:
                j = u - 1
                in_band = jnp.logical_and(
                    j >= i - w_lane, j < i + w_lane + 1)
                live = jnp.logical_and(
                    jnp.logical_or(in_band, u == 0), qmask)
            else:
                live = qmask
            Mx = jnp.where(live, M, 0)
            Ex = jnp.where(live, E, 0)

            t_ins = jnp.maximum(Mx - oe_ins, 0)
            G = jnp.where(u == 0, NEG, t_ins + e_ins * u)
            F = _prefix_max_exclusive(G, QP) - e_ins * (u - 1)
            F = jnp.maximum(F, 0)
            F = jnp.where(live, F, 0)

            Hn = jnp.maximum(jnp.maximum(Mx, Ex), F)
            b0 = jnp.maximum(h0 - (o_del + e_del * (i + 1)), 0)
            Hn = jnp.where(u == 0, b0, Hn)

            En = jnp.maximum(Ex - e_del, jnp.maximum(Mx - oe_del, 0))
            En = jnp.where(live, En, 0)

            Ht = jnp.where(jnp.logical_and(live, u >= 1), Hn, -1)
            rowmax = jnp.max(Ht, axis=1, keepdims=True)
            mj = jnp.max(
                jnp.where(Ht == rowmax, u, -1), axis=1, keepdims=True)

            h_end = jnp.max(
                jnp.where(u == qlen, Hn, NEG), axis=1, keepdims=True)
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
                zd = jnp.where(
                    di > dj,
                    best - rowmax - (di - dj) * e_del > zdrop,
                    best - rowmax - (dj - di) * e_ins > zdrop,
                )
                dead = jnp.logical_or(
                    dead,
                    jnp.logical_and(
                        jnp.logical_and(active, jnp.logical_not(b_upd)),
                        zd),
                )
            dead = jnp.logical_or(dead, i + 1 >= tlen)

            H = jnp.where(active, Hn, H)
            E = jnp.where(active, En, E)
            return (H, E, best, qle, tle, gscore, gtle, moff,
                    dead.astype(jnp.int32))

        z = jnp.zeros((TILE, 1), jnp.int32)
        init = (
            H0, jnp.zeros((TILE, QP), jnp.int32),
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
            [best, qle, tle, gscore, gtle, moff, z, z], axis=1)
        out_ref[:] = out

    return kernel


@partial(jax.jit, static_argnames=("params_tuple", "tile", "interpret"))
def _extend_pallas_impl(query, target, meta, params_tuple, tile, interpret):
    (a, b, o_del, e_del, o_ins, e_ins, w, zdrop, end_bonus, opt_ext) = \
        params_tuple
    N, QP = query.shape
    TMAX = target.shape[1]
    kernel = _make_kernel(QP, TMAX, a, b, o_del, e_del, o_ins, e_ins, w,
                          zdrop, end_bonus, opt_ext)
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
    if tile is None:
        # fit the tile's DP state in scoped VMEM (~16 MB): ~10 live
        # (TILE, QP) int32 buffers + 2 (TILE, TMAX) buffers
        QP_ = -(-(QMAX + 1) // 128) * 128
        TM_ = -(-target.shape[1] // 128) * 128
        row_bytes = 4 * (10 * QP_ + 2 * TM_)
        tile = 256
        while tile > 8 and tile * row_bytes > 12 * 1024 * 1024:
            tile //= 2
    # sort jobs by target length so each kernel tile sees similar tlen and
    # the per-tile dynamic trip count pays off; unsorted on the way out
    order = jnp.argsort(tlen.astype(jnp.int32))
    inv = jnp.argsort(order)
    query = query[order]
    target = target[order]
    qlen = qlen[order]
    tlen = tlen[order]
    h0 = h0[order]
    QP = -(-(QMAX + 1) // 128) * 128
    TMAX = -(-target.shape[1] // 128) * 128
    Np = -(-N // tile) * tile
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
    out = _extend_pallas_impl(qs, ts, meta, pt, tile, interpret)[:N][inv]
    return dict(score=out[:, 0], qle=out[:, 1], tle=out[:, 2],
                gscore=out[:, 3], gtle=out[:, 4], max_off=out[:, 5])


# the mismatch penalty is carried on ExtendParams via the score matrix the
# caller built; default bwa form is (a=1, b=4)
def _mismatch_from(params):
    return getattr(params, "mismatch", 4)
