"""Batched FM-index primitives on device: occ, bi-interval extension, LF,
SA lookup.

TPU-native re-expression of the reference's GPU FM machinery
(reference: src/GPUSeed/seed_gen.cu:57-272 pop_count/bwt_occ_gpu/
find_occ4_gpu, :607-663 locate_seeds_gpu): rank queries are one 32-byte
row gather (occ checkpoint + 64 packed bases) followed by masked 2-bit
popcounts on the VPU; the SA walk is a fixed-trip LF loop bounded by the
text-position sampling interval (see index/format.py).

All functions are written for scalar ints and vmapped — XLA batches the
gathers. Positions/counts are int32 (seq_len < 2^31 enforced at build).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..index.device import DeviceFMIndex

# mask_table[r] = uint32 mask keeping the top 2*r bits (bases 0..r-1 of a word)
_MASK_TABLE = [0] + [
    (0xFFFFFFFF << (32 - 2 * r)) & 0xFFFFFFFF for r in range(1, 17)
]
# 2-bit code c replicated 16x
_PAT = [0x00000000, 0x55555555, 0xAAAAAAAA, 0xFFFFFFFF]


def _prefix_mask(r_w):
    """uint32 mask keeping the top 2*r_w bits, r_w in [0, 16] — computed
    arithmetically: table lookups are gathers, and even 17-entry gathers
    are slow on the TPU VPU."""
    full = jnp.uint32(0xFFFFFFFF)
    sh = jnp.clip(32 - 2 * r_w, 0, 31).astype(jnp.uint32)
    m = (full << sh) & full
    return jnp.where(r_w <= 0, jnp.uint32(0), m)


def _count_codes_masked(words, r):
    """Count occurrences of each 2-bit code among the first `r` bases of a
    4-word (64-base) group. words: (4,) int32; r: scalar int32 in [0, 64].
    Returns (4,) int32."""
    w = words.astype(jnp.uint32)  # (4,)
    r_w = jnp.clip(r - 16 * jnp.arange(4, dtype=jnp.int32), 0, 16)
    masks = _prefix_mask(r_w)  # (4,)
    pats = jnp.asarray(_PAT, dtype=jnp.uint32)  # (4,) static iota pattern
    x = w[None, :] ^ pats[:, None]          # (code, word)
    y = ~x
    pairs = y & (y >> 1) & jnp.uint32(0x55555555)
    pairs = pairs & masks[None, :]
    return jax.lax.population_count(pairs).sum(axis=1).astype(jnp.int32)


def _select4(vec4, c):
    """vec4[c] for c in 0..3 without a gather (compare + sum on the VPU)."""
    sel = (jnp.arange(4, dtype=jnp.int32) == c).astype(vec4.dtype)
    return (vec4 * sel).sum()


def occ4(fm: DeviceFMIndex, i):
    """Counts of bases 0..3 in BWT$[0:i] (sentinel excluded). i: int32
    scalar in [0, seq_len+1]."""
    j = i - (i > fm.primary).astype(jnp.int32)
    blk = j >> 6
    r = j & 63
    row = fm.occ_blocks[blk]  # (8,)
    base_cnt = row[:4]
    return base_cnt + _count_codes_masked(row[4:], r)


def occ1(fm: DeviceFMIndex, i, c):
    """Count of base c in BWT$[0:i] — single-code fast path (4x less
    popcount work than occ4; the backward walk and SA walk only ever need
    one code)."""
    j = i - (i > fm.primary).astype(jnp.int32)
    blk = j >> 6
    r = j & 63
    row = fm.occ_blocks[blk]
    w = row[4:].astype(jnp.uint32)
    r_w = jnp.clip(r - 16 * jnp.arange(4, dtype=jnp.int32), 0, 16)
    c = jnp.asarray(c, jnp.int32)
    pat = c.astype(jnp.uint32) * jnp.uint32(0x55555555)
    x = w ^ pat
    y = ~x
    pairs = y & (y >> 1) & jnp.uint32(0x55555555)
    pairs = pairs & _prefix_mask(r_w)
    base = _select4(row[:4].astype(jnp.int32), c)
    return base + jax.lax.population_count(pairs).sum().astype(jnp.int32)


def lf(fm: DeviceFMIndex, row):
    """LF mapping over BWT$ rows; LF(primary) = 0. One row gather serves
    both the BWT symbol and the rank."""
    j = row - (row > fm.primary).astype(jnp.int32)
    blk = j >> 6
    r = j & 63
    occ_row = fm.occ_blocks[blk]
    w4 = occ_row[4:].astype(jnp.uint32)
    word = _select4(w4.astype(jnp.int32), r >> 4).astype(jnp.uint32)
    c = ((word >> (30 - 2 * (r & 15)).astype(jnp.uint32)) & 3).astype(jnp.int32)
    # rank of c among the first r bases of this block
    r_w = jnp.clip(r - 16 * jnp.arange(4, dtype=jnp.int32), 0, 16)
    pat = c.astype(jnp.uint32) * jnp.uint32(0x55555555)
    y = ~(w4 ^ pat)
    pairs = y & (y >> 1) & jnp.uint32(0x55555555) & _prefix_mask(r_w)
    occ_c = (_select4(occ_row[:4].astype(jnp.int32), c)
             + jax.lax.population_count(pairs).sum().astype(jnp.int32))
    l2c = _select4(fm.L2[:4].astype(jnp.int32), c)
    dest = l2c + 1 + occ_c
    return jnp.where(row == fm.primary, jnp.int32(0), dest)


def bwt_char(fm: DeviceFMIndex, row):
    """BWT$ symbol at `row` (0..3; caller handles row == primary)."""
    j = row - (row > fm.primary).astype(jnp.int32)
    blk = j >> 6
    r = j & 63
    w4 = fm.occ_blocks[blk][4:].astype(jnp.int32)
    w = _select4(w4, r >> 4).astype(jnp.uint32)
    return ((w >> (30 - 2 * (r & 15)).astype(jnp.uint32)) & 3).astype(jnp.int32)


def backward_ext_ks(fm: DeviceFMIndex, k, s, c):
    """Backward extension of the k-side interval only (prepend base c).
    The l-side is not maintained — sufficient for the backward SMEM walk,
    whose output (k, s) feeds SA lookups and occurrence counts."""
    ok = occ1(fm, k, c)
    ol = occ1(fm, k + s, c)
    l2c = _select4(fm.L2[:4].astype(jnp.int32), jnp.asarray(c, jnp.int32))
    return l2c + 1 + ok, ol - ok


def backward_ext_ks_batch(fm: DeviceFMIndex, k, s, c):
    """Batched backward_ext_ks over (P,) arrays with the two rank gathers
    fused into ONE row-gather pass (dependent gather passes serialize at
    ~5 ms each on TPU; independent ones overlap, so one 2P-row pass beats
    two P-row passes — the reference fuses the same pair into shared cache
    lines, seed_gen.cu:160-272 find_occ_gpu)."""
    P = k.shape[0]
    i2 = jnp.concatenate([k, k + s])                     # (2P,)
    j = i2 - (i2 > fm.primary).astype(jnp.int32)
    blk = j >> 6
    r = j & 63
    rows = fm.occ_blocks[blk]                            # (2P, 8) one pass
    w = rows[:, 4:].astype(jnp.uint32)                   # (2P, 4)
    r_w = jnp.clip(r[:, None] - 16 * jnp.arange(4, dtype=jnp.int32)[None, :],
                   0, 16)
    c2 = jnp.concatenate([c, c]).astype(jnp.uint32)
    pat = (c2 * jnp.uint32(0x55555555))[:, None]
    y = ~(w ^ pat)
    full = jnp.uint32(0xFFFFFFFF)
    sh = jnp.clip(32 - 2 * r_w, 0, 31).astype(jnp.uint32)
    masks = jnp.where(r_w <= 0, jnp.uint32(0), (full << sh) & full)
    pairs = y & (y >> 1) & jnp.uint32(0x55555555) & masks
    pc = jax.lax.population_count(pairs).sum(axis=1).astype(jnp.int32)
    sel = (jnp.arange(4, dtype=jnp.int32)[None, :] == c[:, None])
    base = jnp.where(jnp.concatenate([sel, sel]),
                     rows[:, :4].astype(jnp.int32), 0).sum(axis=1)
    occ = base + pc
    ok, ol = occ[:P], occ[P:]
    l2c = jnp.where(sel, fm.L2[:4].astype(jnp.int32)[None, :], 0).sum(axis=1)
    return l2c + 1 + ok, ol - ok


def backward_ext4(fm: DeviceFMIndex, k, l, s):
    """All four backward extensions of bi-interval (k, l, s).
    Returns (k4, l4, s4), each (4,) int32, index = prepended base."""
    ok = occ4(fm, k)
    ol = occ4(fm, k + s)
    cnt = ol - ok
    cnt_sent = jnp.logical_and(k <= fm.primary, fm.primary < k + s)
    cnt_sent = cnt_sent.astype(jnp.int32)
    k4 = fm.L2[:4] + 1 + ok
    s4 = cnt
    # l'(c) = l + cnt_sent + sum_{b > c} cnt[b]
    suffix = jnp.cumsum(cnt[::-1])[::-1] - cnt  # sum of cnt[c+1:]
    l4 = l + cnt_sent + suffix
    return k4, l4, s4


def forward_ext4(fm: DeviceFMIndex, k, l, s):
    """All four forward extensions (append base b). Returns (k4, l4, s4),
    index = appended base."""
    bk4, bl4, bs4 = backward_ext4(fm, l, k, s)
    # appended base b corresponds to prepending comp(b) on the revcomp side
    return bl4[::-1], bk4[::-1], bs4[::-1]


def set_intv(fm: DeviceFMIndex, c):
    """Initial bi-interval of single base c (c in 0..3)."""
    k = fm.L2[c] + 1
    l = fm.L2[3 - c] + 1
    s = fm.L2[c + 1] - fm.L2[c]
    return k, l, s


def sa_lookup_batch(fm: DeviceFMIndex, rows):
    """Batched SA$ lookup over (P,) rows: fixed-trip LF walk where each
    trip issues ONE fused gather pass (occ row for LF + sampled-SA bitmap
    row, both living in the combined fm.occ_blocks table), and the
    ssa_vals gather is deferred to a single pass after the loop."""
    P = rows.shape[0]
    four = jnp.arange(4, dtype=jnp.int32)[None, :]

    def trip(carry, step):
        r, rank_hit, step_hit, done = carry
        j = r - (r > fm.primary).astype(jnp.int32)
        idx2 = jnp.concatenate([j >> 6, fm.n_occ_blocks + (r >> 6)])
        rows2 = fm.occ_blocks[idx2]              # ONE pass (2P, 8)
        occ_row, ssa_row = rows2[:P], rows2[P:]
        # sampled test + rank (bitmap of sampled rows, 64 rows/block)
        off = r & 63
        lo = ssa_row[:, 1].astype(jnp.uint32)
        hi = ssa_row[:, 2].astype(jnp.uint32)
        word = jnp.where(off < 32, lo, hi)
        bit = (word >> (off & 31).astype(jnp.uint32)) & 1
        below_lo = lo & ((jnp.uint32(1)
                          << jnp.clip(off, 0, 31).astype(jnp.uint32)) - 1)
        below_lo = jnp.where(off >= 32, lo, below_lo)
        below_hi = jnp.where(
            off > 32,
            hi & ((jnp.uint32(1)
                   << jnp.clip(off - 32, 0, 31).astype(jnp.uint32)) - 1),
            jnp.uint32(0))
        rank = (ssa_row[:, 0]
                + jax.lax.population_count(below_lo).astype(jnp.int32)
                + jax.lax.population_count(below_hi).astype(jnp.int32))
        hit = jnp.logical_and(bit == 1, jnp.logical_not(done))
        rank_hit = jnp.where(hit, rank, rank_hit)
        step_hit = jnp.where(hit, step, step_hit)
        done = jnp.logical_or(done, hit)
        # LF from the already-gathered occ row
        w4 = occ_row[:, 4:].astype(jnp.uint32)
        rr = j & 63
        word_i = rr >> 4
        w = jnp.where((four == word_i[:, None]),
                      w4.astype(jnp.int32), 0).sum(axis=1).astype(jnp.uint32)
        c = ((w >> (30 - 2 * (rr & 15)).astype(jnp.uint32)) & 3).astype(jnp.int32)
        r_w = jnp.clip(rr[:, None] - 16 * four, 0, 16)
        pat = (c.astype(jnp.uint32) * jnp.uint32(0x55555555))[:, None]
        y = ~(w4 ^ pat)
        full = jnp.uint32(0xFFFFFFFF)
        sh = jnp.clip(32 - 2 * r_w, 0, 31).astype(jnp.uint32)
        masks = jnp.where(r_w <= 0, jnp.uint32(0), (full << sh) & full)
        pairs = y & (y >> 1) & jnp.uint32(0x55555555) & masks
        occ_c = (jnp.where(four == c[:, None],
                           occ_row[:, :4].astype(jnp.int32), 0).sum(axis=1)
                 + jax.lax.population_count(pairs).sum(axis=1).astype(jnp.int32))
        l2c = jnp.where(four == c[:, None],
                        fm.L2[:4].astype(jnp.int32)[None, :], 0).sum(axis=1)
        dest = jnp.where(r == fm.primary, 0, l2c + 1 + occ_c)
        r = jnp.where(done, r, dest)
        return (r, rank_hit, step_hit, done), None

    init = (rows, jnp.zeros(P, jnp.int32), jnp.zeros(P, jnp.int32),
            jnp.zeros(P, jnp.bool_))
    (r, rank_hit, step_hit, _), _ = jax.lax.scan(
        trip, init, jnp.arange(fm.sa_intv, dtype=jnp.int32))
    return fm.ssa_vals[rank_hit] + step_hit   # one deferred pass


def forward_ext4_batch(fm: DeviceFMIndex, k, l, s):
    """Batched forward extension over (P,) bi-intervals with the two rank
    gathers fused into ONE pass. Returns (k4, l4, s4), each (P, 4),
    indexed by the appended base."""
    P = k.shape[0]
    i2 = jnp.concatenate([l, l + s])
    j = i2 - (i2 > fm.primary).astype(jnp.int32)
    rows = fm.occ_blocks[j >> 6]                  # ONE pass (2P, 8)
    r = j & 63
    w = rows[:, 4:].astype(jnp.uint32)            # (2P, 4)
    r_w = jnp.clip(r[:, None] - 16 * jnp.arange(4, dtype=jnp.int32)[None, :],
                   0, 16)
    full = jnp.uint32(0xFFFFFFFF)
    sh = jnp.clip(32 - 2 * r_w, 0, 31).astype(jnp.uint32)
    masks = jnp.where(r_w <= 0, jnp.uint32(0), (full << sh) & full)
    pats = (jnp.arange(4, dtype=jnp.uint32)
            * jnp.uint32(0x55555555))[None, :, None]   # (1, code, 1)
    y = ~(w[:, None, :] ^ pats)
    pairs = y & (y >> 1) & jnp.uint32(0x55555555) & masks[:, None, :]
    pc = jax.lax.population_count(pairs).sum(axis=2).astype(jnp.int32)
    occ = rows[:, :4].astype(jnp.int32) + pc      # (2P, 4)
    ok, ol = occ[:P], occ[P:]
    cnt = ol - ok                                  # (P, 4) per prepended c
    cnt_sent = jnp.logical_and(l <= fm.primary, fm.primary < l + s)
    # backward_ext4 on the revcomp side (swap k/l), then flip base order
    bk4 = fm.L2[:4].astype(jnp.int32)[None, :] + 1 + ok
    suffix = (jnp.cumsum(cnt[:, ::-1], axis=1)[:, ::-1] - cnt)
    bl4 = k[:, None] + cnt_sent[:, None].astype(jnp.int32) + suffix
    bs4 = cnt
    return bl4[:, ::-1], bk4[:, ::-1], bs4[:, ::-1]


def sa_lookup(fm: DeviceFMIndex, row):
    """SA$[row] via a fixed-trip LF walk to a text-position-sampled row.
    Bounded by sa_intv steps (sampling by SA value guarantees it).
    Scalar reference version (vmappable); the hot path uses
    sa_lookup_batch."""

    def sampled_rank(r):
        blk = r >> 6
        off = r & 63
        b = fm.occ_blocks[fm.n_occ_blocks + blk]  # SSA row of combined table
        lo = b[1].astype(jnp.uint32)
        hi = b[2].astype(jnp.uint32)
        word = jnp.where(off < 32, lo, hi)
        bit = (word >> (off & 31).astype(jnp.uint32)) & 1
        below_lo = lo & ((jnp.uint32(1) << jnp.clip(off, 0, 31).astype(jnp.uint32)) - 1)
        below_lo = jnp.where(off >= 32, lo, below_lo)
        below_hi = jnp.where(
            off > 32,
            hi & ((jnp.uint32(1) << jnp.clip(off - 32, 0, 31).astype(jnp.uint32)) - 1),
            jnp.uint32(0),
        )
        rank = (
            b[0]
            + jax.lax.population_count(below_lo).astype(jnp.int32)
            + jax.lax.population_count(below_hi).astype(jnp.int32)
        )
        return bit.astype(jnp.int32), rank

    def body(step, carry):
        r, val, done = carry
        is_samp, rank = sampled_rank(r)
        hit = jnp.logical_and(is_samp == 1, jnp.logical_not(done))
        val = jnp.where(hit, fm.ssa_vals[rank] + step, val)
        done = jnp.logical_or(done, hit)
        r_next = jnp.where(done, r, lf(fm, r))
        return r_next, val, done

    _, val, _ = jax.lax.fori_loop(
        0, fm.sa_intv, body, (row, jnp.int32(0), jnp.bool_(False))
    )
    return val
