"""Offline FMD-index construction.

Pipeline (mirrors `bwa index` capability, reference bwa_index/bwtindex.c:288
bwa_idx_build, rebuilt from first principles):

  FASTA -> forward codes (N -> seeded-random base, amb runs recorded)
        -> T = fwd || revcomp(fwd)
        -> suffix array (native SA-IS or NumPy doubling)
        -> BWT (+ primary), occ checkpoint blocks
        -> text-position sampled SA (bitmap + rank checkpoints)
        -> FMIndex (.npz)
"""
from __future__ import annotations

import numpy as np

from ..utils.dna import encode, pack_2bit
from .format import Annotation, FMIndex, OCC_BLOCK_BASES, SSA_BLOCK_ROWS
from .suffix_array import suffix_array


def read_fasta(path: str) -> list[tuple[str, np.ndarray, str]]:
    """Parse FASTA into [(name, codes, description)] with codes 0..4."""
    from ..io.fastx import open_maybe_gzip

    out: list = []
    name = None
    anno = ""
    chunks: list[bytes] = []
    with open_maybe_gzip(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith(b">"):
                if name is not None:
                    out.append((name, encode(b"".join(chunks)), anno))
                parts = line[1:].split(None, 1)
                name = parts[0].decode()
                anno = parts[1].decode() if len(parts) > 1 else ""
                chunks = []
            else:
                chunks.append(line)
    if name is not None:
        out.append((name, encode(b"".join(chunks)), anno))
    return out


def _amb_runs(codes: np.ndarray, offset: int) -> list[tuple[int, int]]:
    amb = codes >= 4
    if not amb.any():
        return []
    d = np.diff(amb.astype(np.int8))
    starts = np.flatnonzero(d == 1) + 1
    ends = np.flatnonzero(d == -1) + 1
    if amb[0]:
        starts = np.concatenate([[0], starts])
    if amb[-1]:
        ends = np.concatenate([ends, [len(codes)]])
    return [(int(offset + s), int(e - s)) for s, e in zip(starts, ends)]


def build_index(
    fasta_path: str,
    sa_intv: int = 4,
    rng_seed: int = 11,
) -> FMIndex:
    seqs = read_fasta(fasta_path)
    if not seqs:
        raise ValueError(f"no sequences in {fasta_path}")
    names, lengths, offsets, ambs, annos = [], [], [], [], []
    parts = []
    off = 0
    rng = np.random.default_rng(rng_seed)
    for name, codes, anno in seqs:
        names.append(name)
        annos.append(anno)
        lengths.append(len(codes))
        offsets.append(off)
        ambs.extend(_amb_runs(codes, off))
        amb_mask = codes >= 4
        if amb_mask.any():
            codes = codes.copy()
            codes[amb_mask] = rng.integers(0, 4, amb_mask.sum(), dtype=np.uint8)
        parts.append(codes)
        off += len(codes)
    fwd = np.concatenate(parts).astype(np.uint8)
    ann = Annotation(names=names, lengths=lengths, offsets=offsets,
                     ambs=ambs, annos=annos)
    return build_index_from_codes(fwd, ann, sa_intv=sa_intv)


def build_index_from_codes(
    fwd: np.ndarray, ann: Annotation, sa_intv: int = 4
) -> FMIndex:
    """Build from an unambiguous 0..3 coded forward genome."""
    fwd = np.asarray(fwd, dtype=np.uint8)
    if fwd.max(initial=0) > 3:
        raise ValueError("forward genome must be unambiguous (0..3)")
    l_pac = len(fwd)
    if 2 * l_pac + 1 >= 2**33:
        raise ValueError(
            "genomes with 2*l_pac >= 2^33 exceed the split-word scheme "
            "(uint32 low + upper bits); not supported")
    T = np.concatenate([fwd, (3 - fwd)[::-1]]).astype(np.uint8)
    seq_len = len(T)

    sa = suffix_array(T)  # seq_len rows, sentinel row excluded
    # Conceptual SA over T$ : row 0 is the sentinel suffix (value seq_len).
    primary = int(np.flatnonzero(sa == 0)[0]) + 1

    # BWT over T$ with the sentinel row removed (bwa convention).
    # BWT$[r] = T[SA$[r]-1]; at r=0, SA$[0]=seq_len -> T[seq_len-1].
    bwt_full = np.empty(seq_len + 1, dtype=np.uint8)
    bwt_full[0] = T[seq_len - 1]
    bwt_full[1:] = T[(sa - 1) % seq_len]  # value at primary row is bogus ($)
    B = np.delete(bwt_full, primary)

    counts = np.bincount(B, minlength=4)[:4]
    L2 = np.zeros(5, dtype=np.int64)
    L2[1:] = np.cumsum(counts)

    # occ checkpoint blocks; one extra terminal block so that queries at
    # row seq_len(+1) stay in range when seq_len is a multiple of the
    # block size (occ4 may be evaluated at interval end = seq_len + 1)
    n_blocks = (seq_len + OCC_BLOCK_BASES - 1) // OCC_BLOCK_BASES + 1
    Bp = np.zeros(n_blocks * OCC_BLOCK_BASES, dtype=np.uint8)
    Bp[:seq_len] = B
    one_hot = (Bp.reshape(n_blocks, OCC_BLOCK_BASES)[:, :, None]
               == np.arange(4)[None, None, :])
    per_block = one_hot.sum(axis=1).astype(np.int64)
    # counts before each block; padding bases (code 0) in the last block are
    # harmless because queries never exceed seq_len.
    cum = np.zeros((n_blocks, 4), dtype=np.int64)
    cum[1:] = np.cumsum(per_block, axis=0)[:-1]
    # keep the final partial block's padding (code 0) out of the terminal
    # row: store true totals there, as the reference's trailing occ entry
    # does (bwa_index/bwtindex.c:186-188) — the row is only ever queried
    # when seq_len is a block multiple, in which case it already is
    cum[-1] = counts
    occ_blocks = np.empty((n_blocks, 8), dtype=np.uint32)
    occ_blocks[:, :4] = cum.astype(np.uint32)
    occ_blocks[:, 4:] = pack_2bit(Bp).reshape(n_blocks, 4)

    # text-position sampled SA over the (seq_len+1)-row conceptual SA
    sa_full = np.empty(seq_len + 1, dtype=np.int64)
    sa_full[0] = seq_len
    sa_full[1:] = sa
    sampled = (sa_full % sa_intv) == 0
    n_sblocks = (seq_len + 1 + SSA_BLOCK_ROWS - 1) // SSA_BLOCK_ROWS
    bits = np.zeros(n_sblocks * SSA_BLOCK_ROWS, dtype=bool)
    bits[: seq_len + 1] = sampled
    bits = bits.reshape(n_sblocks, SSA_BLOCK_ROWS)
    per_block_rank = bits.sum(axis=1).astype(np.int64)
    rank_before = np.zeros(n_sblocks, dtype=np.int64)
    rank_before[1:] = np.cumsum(per_block_rank)[:-1]
    weights_lo = (1 << np.arange(32, dtype=np.uint64))
    bits_lo = (bits[:, :32].astype(np.uint64) * weights_lo).sum(axis=1)
    bits_hi = (bits[:, 32:].astype(np.uint64) * weights_lo).sum(axis=1)
    ssa_blocks = np.empty((n_sblocks, 4), dtype=np.uint32)
    ssa_blocks[:, 0] = rank_before.astype(np.uint32)
    ssa_blocks[:, 1] = bits_lo.astype(np.uint32)
    ssa_blocks[:, 2] = bits_hi.astype(np.uint32)
    ssa_blocks[:, 3] = 0
    # split SA values: uint32 low words + uint8 upper bits (the reference
    # packs upper bits the same way for >4G-position genomes,
    # bwa_index/bwt.c:88-148; uint8 covers seq_len < 2^40)
    sampled_vals = sa_full[sampled]
    ssa_vals = (sampled_vals & 0xFFFFFFFF).astype(np.uint32)
    ssa_vals_hi = (sampled_vals >> 32).astype(np.uint8)

    assert seq_len < (1 << 33), "genomes above 2^33 doubled bases unsupported"

    return FMIndex(
        l_pac=l_pac,
        seq_len=seq_len,
        primary=primary,
        sa_intv=sa_intv,
        L2=L2,
        occ_blocks=occ_blocks,
        ssa_blocks=ssa_blocks,
        ssa_vals=ssa_vals,
        ssa_vals_hi=ssa_vals_hi,
        pac_words=pack_2bit(fwd),
        ann=ann,
    )
