"""Banded Pallas TPU kernel for ksw-extend on LONG reads.

Same semantics contract as ops/pallas/extend_kernel.py (reference:
src/bwamem.c:1791-1908 decoy_cpu_align -> src/ksw.c:864-988 ksw_extend2,
band applied as in the lax twin ops/extend.py `opt_ext`), but the DP row
lives in a SLIDING WINDOW of lanes anchored to the band diagonal instead
of spanning the whole query:

    lane v of row i  <->  DP column u = i + v - w

With that anchoring the affine-gap recurrences become lane-local:

  * diagonal  H(i-1, u-1) -> SAME lane of the previous window;
  * vertical  E(i-1, u)   -> previous window shifted LEFT one lane;
  * horizontal F          -> log-step prefix max over WP window lanes
                             (not the full query width);
  * the query character for lane v advances one position per row: the
    window shifts left and ONE code (a masked reduction over the full
    query, 1 VPU pass) is inserted at the right edge.

Per-row cost is O(WP = round128(2w+3)) plus two full-width masked
reductions, vs the dense kernel's O(round128(qlen)) — for a 10 kbp read
with the default w=300 band that is ~12x less VPU work per row. The
reference caps reads at MAX_SEQ_LEN=300 (GASAL2), so this path is
parity-plus: it is what makes `-x pacbio`/`-x ont2d` real.

The dense kernel stays the right choice for short reads (window wider
than the read); the dispatch in ops/extend.py picks per call.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -0x40000000


def _shl(x, fill):
    """x shifted left by one lane, right-filled with `fill`."""
    pad = jnp.full((x.shape[0], 1), fill, x.dtype)
    return jnp.concatenate([x[:, 1:], pad], axis=1)


def _shr(x, d, fill):
    pad = jnp.full((x.shape[0], d), fill, x.dtype)
    return jnp.concatenate([pad, x[:, :-d]], axis=1)


def _prefix_max_exclusive(x, width):
    acc = _shr(x, 1, NEG)
    d = 1
    while d < width:
        acc = jnp.maximum(acc, _shr(acc, d, NEG))
        d <<= 1
    return acc


def _make_banded_kernel(WP, QP, TP, a, b, o_del, e_del, o_ins, e_ins, w,
                        zdrop, end_bonus):
    import numpy as _np

    # pin closure scalars to int32 (x64 promotion trips Mosaic)
    a, b = _np.int32(a), _np.int32(b)
    o_del, e_del = _np.int32(o_del), _np.int32(e_del)
    o_ins, e_ins = _np.int32(o_ins), _np.int32(e_ins)
    w, zdrop = _np.int32(w), _np.int32(zdrop)
    end_bonus = _np.int32(end_bonus)
    oe_del = _np.int32(o_del + e_del)
    oe_ins = _np.int32(o_ins + e_ins)

    def kernel(q_ref, t_ref, meta_ref, out_ref):
        # q_ref: (TILE, QP) raw query codes at columns 0..qlen-1 (pad 4)
        # t_ref: (TILE, TP) target codes; meta: [qlen, tlen, h0, ...]
        TILE = q_ref.shape[0]
        v = jax.lax.broadcasted_iota(jnp.int32, (TILE, WP), 1)
        qlen = meta_ref[:, 0:1]
        tlen = meta_ref[:, 1:2]
        h0 = meta_ref[:, 2:3]

        def bc(x):
            return jnp.broadcast_to(x, (TILE, WP))

        qlen_b = bc(qlen)
        h0_b = bc(h0)

        q_all = q_ref[:]
        t_all = t_ref[:]
        q_lane = jax.lax.broadcasted_iota(jnp.int32, q_all.shape, 1)
        t_lane = jax.lax.broadcasted_iota(jnp.int32, t_all.shape, 1)

        # per-lane clamped band half-width (reference w clamp)
        max_ins = jnp.maximum((qlen * a + end_bonus - o_ins) // e_ins + 1, 1)
        max_del = jnp.maximum((qlen * a + end_bonus - o_del) // e_del + 1, 1)
        w_lane = jnp.minimum(jnp.minimum(max_ins, max_del), w)  # (TILE, 1)

        # initial window = the virtual row i=-1 (the carry is read as the
        # DIAGONAL by row 0): lane v holds H_init at column u = v - w - 1
        u0 = v - w - 1
        H0 = jnp.maximum(h0_b - o_ins - e_ins * u0, 0)
        H0 = jnp.where(u0 == 0, h0_b, H0)
        H0 = jnp.where(jnp.logical_and(u0 >= 0, u0 <= qlen_b), H0, 0)
        # query codes for row 0: lane v needs q[v - w - 1] (4 outside)
        qwin0 = _shr(q_all[:, :WP], int(w) + 1, jnp.int32(4))

        eu = e_ins * v  # e_ins * lane; the row-constant offset cancels in F

        def row(i, carry):
            (H, E, qwin, best, qle, tle, gscore, gtle, moff, dead_i) = carry
            dead = dead_i > 0
            active = jnp.logical_and(jnp.logical_not(dead), i < tlen)
            tchar = jnp.max(jnp.where(t_lane == i, t_all, -1), axis=1,
                            keepdims=True)
            tchar_b = bc(tchar)

            # u = i + v - w for this row
            u = v + (i - w)
            live = jnp.logical_and(
                jnp.logical_and(u >= 1, u <= qlen_b),
                jnp.logical_and(v >= bc(w - w_lane + 1),
                                v <= bc(w + w_lane + 1)))

            S = jnp.where(qwin == tchar_b, a, -b)
            S = jnp.where(jnp.logical_or(qwin > 3, tchar_b > 3),
                          jnp.int32(-1), S)

            Hd = H                    # diagonal: same lane of prev window
            Ex = _shl(E, jnp.int32(0))  # vertical: prev window lane v+1
            M = jnp.where(Hd > 0, Hd + S, 0)
            Mx = jnp.where(live, M, 0)
            Exl = jnp.where(live, Ex, 0)

            t_ins = jnp.maximum(Mx - oe_ins, 0)
            G = jnp.where(u <= 0, jnp.int32(NEG), t_ins + eu)
            F = _prefix_max_exclusive(G, WP) - eu + e_ins
            F = jnp.maximum(F, 0)
            F = jnp.where(live, F, 0)

            Hn = jnp.maximum(jnp.maximum(Mx, Exl), F)
            b0 = jnp.maximum(h0 - (o_del + e_del * (i + 1)), 0)
            Hn = jnp.where(u == 0, bc(b0), Hn)

            En = jnp.maximum(Exl - e_del, jnp.maximum(Mx - oe_del, 0))

            # fused (rowmax, lane) packed-key reduction; tie -> largest u
            Ht = jnp.where(live, Hn, jnp.int32(-1))
            key = jnp.max((Ht + 1) * WP + v, axis=1, keepdims=True)
            rowmax = key // WP - 1
            mj = jnp.where(rowmax >= 0, key % WP + (i - w), -1)

            # H(i, qlen): masked reduction; when the band has moved PAST
            # the query end the dense twins read a stored 0 — reproduce it
            He = jnp.where(u == qlen_b, Hn, jnp.int32(NEG))
            h_end = jnp.max(He, axis=1, keepdims=True)
            h_end = jnp.where(i - w > qlen, 0, h_end)
            g_upd = jnp.logical_and(active, h_end >= gscore)
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

            act_b = bc(active.astype(jnp.int32))
            H = jnp.where(act_b > 0, Hn, H)
            E = jnp.where(act_b > 0, En, E)
            # advance the query window for row i+1: shift left, fetch the
            # new right-edge code q[i + WP - w - 1] (one full-width pass)
            qnew = jnp.max(
                jnp.where(q_lane == i + (WP - w - 1), q_all, -1),
                axis=1, keepdims=True)
            qnew = jnp.where(qnew < 0, 4, qnew)
            qwin = jnp.where(v == WP - 1, bc(qnew),
                             _shl(qwin, jnp.int32(4)))
            # ALWAYS advance qwin (it is i-indexed, not state-dependent);
            # dead lanes never read it again
            return (H, E, qwin, best, qle, tle, gscore, gtle, moff,
                    dead.astype(jnp.int32))

        z = jnp.zeros((TILE, 1), jnp.int32)
        init = (
            H0, jnp.zeros((TILE, WP), jnp.int32), qwin0,
            h0, z, z,
            jnp.full((TILE, 1), -1, jnp.int32), z, z,
            (tlen <= 0).astype(jnp.int32),
        )
        tl_max = jnp.minimum(jnp.max(meta_ref[:, 1]), TP)

        def _cond(c):
            i, st = c
            return jnp.logical_and(i < tl_max, jnp.min(st[9]) < 1)

        def _body(c):
            i, st = c
            return i + 1, row(i, st)

        _, st = jax.lax.while_loop(_cond, _body, (jnp.int32(0), init))
        (_, _, _, best, qle, tle, gscore, gtle, moff, _) = st
        out = jnp.concatenate(
            [best, qle, tle, gscore, gtle, moff, z, z], axis=1)
        out_ref[:] = out

    return kernel


@partial(jax.jit, static_argnames=("params_tuple", "tile", "interpret"))
def _banded_pallas_impl(query, target, meta, params_tuple, tile, interpret):
    (a, b, o_del, e_del, o_ins, e_ins, w, zdrop, end_bonus) = params_tuple
    N, QP = query.shape
    TP = target.shape[1]
    WP = -(-(2 * w + 3) // 128) * 128
    kernel = _make_banded_kernel(WP, QP, TP, a, b, o_del, e_del, o_ins,
                                 e_ins, w, zdrop, end_bonus)
    grid = (N // tile,)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, 8), jnp.int32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile, QP), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, TP), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 8), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, 8), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(query, target, meta)
    return out


def extend_batch_banded(query, target, qlen, tlen, h0, params, *,
                        tile: int | None = None,
                        interpret: bool | None = None):
    """Banded long-read twin of extend_batch_pallas (same return dict).

    Query layout here is RAW codes at columns 0..qlen-1 (the window
    kernel does its own u>=1 anchoring). Callers should route here when
    round128(qlen+1) is wider than the band window (see
    ops/extend.py extend_batch_auto)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    N, QMAX = query.shape
    p = params
    w = int(p.w)
    WP = -(-(2 * w + 3) // 128) * 128

    # sort by tlen so tiles are length-coherent for the dynamic trip count
    key = tlen.astype(jnp.int32)
    order = jnp.argsort(key)
    inv = jnp.argsort(order)
    query = query[order]
    target = target[order]
    qlen = qlen[order]
    tlen = tlen[order]
    h0 = h0[order]

    QP = max(-(-QMAX // 128) * 128, WP)  # window init slices q[:, :WP]
    TP = -(-target.shape[1] // 128) * 128
    # VMEM budget: ~6 live (TILE, WP) buffers + q + t rows
    row_bytes = 4 * (6 * WP + QP + TP)
    tile_w = tile or 256
    while tile_w > 8 and tile_w * row_bytes > 12 * 1024 * 1024:
        tile_w //= 2
    Np = -(-N // tile_w) * tile_w

    qs = jnp.full((Np, QP), 4, jnp.int32)
    qs = qs.at[:N, :QMAX].set(query.astype(jnp.int32))
    ts = jnp.full((Np, TP), 4, jnp.int32)
    ts = ts.at[:N, : target.shape[1]].set(target.astype(jnp.int32))
    meta = jnp.zeros((Np, 8), jnp.int32)
    meta = meta.at[:N, 0].set(qlen.astype(jnp.int32))
    meta = meta.at[:N, 1].set(tlen.astype(jnp.int32))
    meta = meta.at[:N, 2].set(h0.astype(jnp.int32))
    from .extend_kernel import _mismatch_from

    pt = (int(p.max_mat), int(_mismatch_from(p)), int(p.o_del),
          int(p.e_del), int(p.o_ins), int(p.e_ins), w, int(p.zdrop),
          int(p.end_bonus))
    out = _banded_pallas_impl(qs, ts, meta, pt, int(tile_w), interpret)
    out = out[:N][inv]
    return dict(score=out[:, 0], qle=out[:, 1], tle=out[:, 2],
                gscore=out[:, 3], gtle=out[:, 4], max_off=out[:, 5])
