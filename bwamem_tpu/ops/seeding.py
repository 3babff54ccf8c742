"""Batched SMEM seeding on device — TPU re-design of GPUSeed.

Replaces the reference's CUDA two-pass seeding (reference:
src/GPUSeed/seed_gen.cu:868-973 find_seed_intervals_fow, :977-1085
find_seed_intervals_back, :520-663 seeds_to_threads/locate_seeds_gpu) with
fixed-shape XLA programs:

  pass 1 (forward): lax.scan over read positions; per read a running FMD
    bi-interval; a candidate (segment_start, end=i, interval-before-step) is
    emitted into its per-position slot whenever the interval size changes —
    including shrink-to-zero, ambiguous bases and the read end (the
    reference restarts its walk at the failing position; we do the same via
    the restart branch).
  compaction: candidates -> fixed capacity per read via a stable argsort on
    the emit flag (replaces CUB DeviceSelect::Flagged).
  pass 2 (backward): masked while_loop extending every candidate maximally
    to the left (replaces the per-thread walk + warp-shuffle dedup).
  containment filter: a candidate is an SMEM iff its qbeg is strictly less
    than every later-ending candidate's qbeg — a reversed exclusive cummin
    per read (replaces N_SHUFFLES warp dedup + filter_seed_intervals_gpu).
  occurrence expansion: per-SMEM occurrence subsampling with stride
    step = s // max_occ (the rule applied by mem_chain, reference
    src/bwamem.c:426-427), exclusive scan + searchsorted expansion into a
    fixed seed capacity, then batched SA lookups.

Output seed order is (qend ascending, SA rank) per read; for SMEMs qend
order equals qbeg order (SMEMs never nest), matching the oracle's
start-sorted order.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..index.device import DeviceFMIndex
from . import fm as fmops

BIG = jnp.int32(0x3FFFFFFF)


@dataclass(frozen=True)
class SeedConfig:
    min_seed_len: int = 19
    max_candidates: int = 64   # per-read cap on forward-pass emissions
    max_seeds: int = 160       # per-read cap on expanded occurrences
    max_occ: int = 500         # subsample SMEMs above this occurrence count


def _forward_pass(fm: DeviceFMIndex, reads, lens, min_seed_len):
    """reads: (B, L) int32 codes (pad/amb = 4); lens: (B,).
    Returns candidate fields, each (B, L+1): start, k, l, s, emit."""
    B, L = reads.shape
    reads_pad = jnp.concatenate(
        [reads, jnp.full((B, 1), 4, jnp.int32)], axis=1
    )

    ext4 = jax.vmap(lambda k, l, s: fmops.forward_ext4(fm, k, l, s))

    def step(carry, i):
        k, l, s, seg_start = carry
        base = reads_pad[:, i]
        base_c = jnp.clip(base, 0, 3)
        valid = jnp.logical_and(i < lens, base < 4)
        active = s > 0

        k4, l4, s4 = ext4(k, l, s)
        take = lambda a: jnp.take_along_axis(a, base_c[:, None], axis=1)[:, 0]
        okk, okl, oks = take(k4), take(l4), take(s4)
        oks = jnp.where(valid, oks, 0)

        shrink = jnp.logical_and(active, oks != s)
        emit = jnp.logical_and(shrink, i >= min_seed_len)
        cand = (seg_start, k, l, s, emit)

        ext_ok = jnp.logical_and(valid, jnp.logical_and(active, oks > 0))
        restart = jnp.logical_and(valid, jnp.logical_not(ext_ok))
        ik = fm.L2[base_c] + 1
        il = fm.L2[3 - base_c] + 1
        is_ = fm.L2[base_c + 1] - fm.L2[base_c]
        k_n = jnp.where(ext_ok, okk, jnp.where(restart, ik, 0))
        l_n = jnp.where(ext_ok, okl, jnp.where(restart, il, 0))
        s_n = jnp.where(ext_ok, oks, jnp.where(restart, is_, 0))
        seg_n = jnp.where(ext_ok, seg_start, i)
        return (k_n, l_n, s_n, seg_n), cand

    z = jnp.zeros((B,), jnp.int32)
    (_, _, _, _), cands = jax.lax.scan(
        step, (z, z, z, z), jnp.arange(L + 1, dtype=jnp.int32)
    )
    # stack: each field (L+1, B) -> (B, L+1)
    start, k, l, s, emit = (jnp.swapaxes(c, 0, 1) for c in cands)
    return start, k, l, s, emit


def _compact(fields, emit, cap):
    """Stable-compact emitted candidates to the front, keep `cap` slots.
    fields: tuple of (B, N) arrays; emit: (B, N) bool."""
    B, N = emit.shape
    slot = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
    key = jnp.where(emit, slot, BIG)
    order = jnp.argsort(key, axis=1)[:, :cap]
    gather = lambda a: jnp.take_along_axis(a, order, axis=1)
    out = tuple(gather(f) for f in fields)
    valid = gather(emit)
    return out, valid


def _backward_pass(fm: DeviceFMIndex, reads, qbeg, k, l, s, valid):
    """Extend each candidate maximally to the left. All args (B, C)."""
    B, C = qbeg.shape

    ext4 = jax.vmap(
        jax.vmap(lambda k_, l_, s_: fmops.backward_ext4(fm, k_, l_, s_))
    )

    def cond(state):
        _, _, _, _, done, it = state
        return jnp.logical_and(jnp.logical_not(jnp.all(done)), it < reads.shape[1])

    def body(state):
        qb, kk, ll, ss, done, it = state
        j = qb - 1
        can = jnp.logical_and(jnp.logical_not(done), j >= 0)
        jc = jnp.clip(j, 0, reads.shape[1] - 1)
        base = jnp.take_along_axis(reads, jc, axis=1)
        can = jnp.logical_and(can, base < 4)
        base_c = jnp.clip(base, 0, 3)
        k4, l4, s4 = ext4(kk, ll, ss)
        take = lambda a: jnp.take_along_axis(a, base_c[:, :, None], axis=2)[:, :, 0]
        nk, nl, ns = take(k4), take(l4), take(s4)
        ok = jnp.logical_and(can, ns >= 1)
        qb = jnp.where(ok, j, qb)
        kk = jnp.where(ok, nk, kk)
        ll = jnp.where(ok, nl, ll)
        ss = jnp.where(ok, ns, ss)
        done = jnp.logical_not(ok)
        return qb, kk, ll, ss, done, it + 1

    done0 = jnp.logical_not(valid)
    qb, kk, ll, ss, _, _ = jax.lax.while_loop(
        cond, body, (qbeg, k, l, s, done0, jnp.int32(0))
    )
    return qb, kk, ll, ss


def _containment_filter(qbeg, qend, valid, min_seed_len):
    """Keep candidate iff qbeg strictly below the min qbeg of all
    later-ending valid candidates, and length >= min_seed_len."""
    q = jnp.where(valid, qbeg, BIG)
    rev = q[:, ::-1]
    cummin = jax.lax.associative_scan(jnp.minimum, rev, axis=1)
    # exclusive suffix min: shift by one
    suff = jnp.concatenate(
        [cummin[:, ::-1][:, 1:], jnp.full((q.shape[0], 1), BIG, jnp.int32)],
        axis=1,
    )
    keep = jnp.logical_and(valid, qbeg < suff)
    keep = jnp.logical_and(keep, (qend - qbeg) >= min_seed_len)
    return keep


def _expand_occurrences(fm, qbeg, qend, k, s, keep, max_seeds, max_occ):
    """Expand SMEMs into per-occurrence seeds with subsampling."""
    B, C = qbeg.shape
    s_v = jnp.where(keep, s, 0)
    step = jnp.where(s_v > max_occ, s_v // max_occ, 1)
    # reference loop: k < n_occ AND count < max_occ (src/bwamem.c:426-431)
    count = jnp.where(s_v > 0, (s_v + step - 1) // step, 0)
    count = jnp.minimum(count, max_occ)
    cum = jnp.cumsum(count, axis=1)  # inclusive
    total = cum[:, -1]
    cum_excl = cum - count

    t = jnp.arange(max_seeds, dtype=jnp.int32)

    def per_read(cum_r, cum_excl_r, total_r):
        cand = jnp.searchsorted(cum_r, t, side="right").astype(jnp.int32)
        cand = jnp.clip(cand, 0, C - 1)
        seed_valid = t < total_r
        off = t - cum_excl_r[cand]
        return cand, off, seed_valid

    cand, off, seed_valid = jax.vmap(per_read)(cum, cum_excl, total)
    g = lambda a: jnp.take_along_axis(a, cand, axis=1)
    rows = g(k) + off * g(step)
    rows = jnp.where(seed_valid, rows, 0)
    rbeg = jax.vmap(jax.vmap(lambda r: fmops.sa_lookup(fm, r)))(rows)
    return dict(
        rbeg=jnp.where(seed_valid, rbeg, -1),
        qbeg=jnp.where(seed_valid, g(qbeg), -1),
        qend=jnp.where(seed_valid, g(qend), -1),
        n_occ=jnp.where(seed_valid, g(s), 0),
        valid=seed_valid,
        n_seeds=jnp.minimum(total, max_seeds),
        overflow=total > max_seeds,
    )


@partial(jax.jit, static_argnames=("cfg",))
def smem_seed_batch(fm: DeviceFMIndex, reads, lens, cfg: SeedConfig = SeedConfig()):
    """End-to-end batched seeding.

    reads: (B, L) int32 base codes (amb/pad = 4); lens: (B,) int32.
    Returns dict of (B, max_seeds) seed arrays + per-read metadata.
    rbeg is in doubled (fwd+rev) coordinates like the reference's
    mem_seed_v_gpu output (reference: seed_gen.h:69-76).
    """
    reads = reads.astype(jnp.int32)
    lens = lens.astype(jnp.int32)
    B, L = reads.shape
    start, k, l, s, emit = _forward_pass(fm, reads, lens, cfg.min_seed_len)
    end = jnp.broadcast_to(jnp.arange(L + 1, dtype=jnp.int32), (B, L + 1))
    (start, end, k, l, s), valid = _compact(
        (start, end, k, l, s), emit, cfg.max_candidates
    )
    qbeg, k, l, s = _backward_pass(fm, reads, start, k, l, s, valid)
    keep = _containment_filter(qbeg, end, valid, cfg.min_seed_len)
    return _expand_occurrences(
        fm, qbeg, end, k, s, keep, cfg.max_seeds, cfg.max_occ
    )
