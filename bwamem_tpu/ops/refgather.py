"""Device-side reference window gathers from the packed 2-bit genome.

Equivalent of bns_get_seq/bns_fetch_seq (reference: src/bntseq.c, and the
commented-out direct-to-device fetch bns_get_seq_gpu at src/bntseq.c:429)
but running on the TPU: positions in doubled (fwd+rev) coordinates index
pac_words; reverse-strand positions map to complemented forward bases.
Out-of-range positions yield code 4 so downstream scoring treats them as
ambiguous padding.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..index.device import DeviceFMIndex


def gather_bases(fm: DeviceFMIndex, pos):
    """Base codes at doubled-coordinate positions `pos` (any shape int;
    positions are int64 — genomes can exceed 2^31 doubled bases).
    Invalid (out of [0, 2*l_pac)) positions -> 4."""
    from .fm import idx_dt

    dt = idx_dt(fm)
    lp = fm.l_pac.astype(dt)
    pos = pos.astype(dt)
    valid = jnp.logical_and(pos >= 0, pos < 2 * lp)
    is_rev = pos >= lp
    fpos = jnp.where(is_rev, 2 * lp - 1 - pos, pos)
    fpos = jnp.clip(fpos, 0, jnp.maximum(lp - 1, 0))
    w = fm.pac_words[(fpos >> 4).astype(jnp.int32)].astype(jnp.uint32)
    sh = (30 - 2 * (fpos & 15)).astype(jnp.uint32)
    base = ((w >> sh) & 3).astype(jnp.int32)
    base = jnp.where(is_rev, 3 - base, base)
    return jnp.where(valid, base, 4)


def gather_window(fm: DeviceFMIndex, start, length: int, strand_clip=True):
    """Windows [start, start+length) per batch element.

    start: (N,) int32 in doubled coords; length: static int.
    When strand_clip is set, positions crossing the forward/reverse
    boundary relative to the window start are masked to 4 (the reference
    clips extension windows at the boundary, src/bwamem.c:1195-1201).
    """
    offs = jnp.arange(length, dtype=jnp.int32)[None, :]
    pos = start[:, None] + offs
    codes = gather_bases(fm, pos)
    if strand_clip:
        lp = fm.l_pac
        start_rev = (start >= lp)[:, None]
        pos_rev = pos >= lp
        codes = jnp.where(start_rev == pos_rev, codes, 4)
    return codes
