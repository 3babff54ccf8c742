"""Pure-NumPy FMD-index oracle: occ / bi-interval extension / SMEM search.

This is the executable specification that the device kernels are tested
against. Semantics follow bwa's bwt_smem1 (reference: src/bwt.c:483-566) and
the FMD bi-interval extension used by GPUSeed's bwt_extend_fow_gpu
(reference: src/GPUSeed/seed_gen.cu:846-866), re-derived from first
principles:

  T = fwd || revcomp(fwd), conceptual SA over T$ has seq_len+1 rows.
  A bi-interval (k, l, s) holds: [k, k+s) = SA rows of pattern P,
  [l, l+s) = SA rows of revcomp(P).
  Backward extension (prepend base c to P):
    cnt[b]   = Occ(b, k+s) - Occ(b, k)            for b in 0..3
    cnt_sent = [k <= primary < k+s]
    k'(c) = L2[c] + 1 + Occ(c, k) ;  s'(c) = cnt[c]
    l'(c) = l + cnt_sent + sum_{b > c} cnt[b]
  Forward extension (append base b) = backward extension of the revcomp
  side with base 3-b, with k and l swapped.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..index.format import FMIndex, OCC_BLOCK_BASES


@dataclass(frozen=True)
class BiInterval:
    k: int
    l: int
    s: int
    # match extents in the query: [start, end)
    start: int = 0
    end: int = 0


class FMOracle:
    def __init__(self, idx: FMIndex):
        self.idx = idx
        self.primary = idx.primary
        self.L2 = idx.L2.astype(np.int64)
        self.seq_len = idx.seq_len

    # ---- occ over the conceptual BWT$ (exclusive prefix count) ----

    def occ4(self, i: int) -> np.ndarray:
        """Counts of bases 0..3 in BWT$[0:i] (sentinel not counted)."""
        if i <= 0:
            return np.zeros(4, dtype=np.int64)
        # remove the sentinel row from the prefix
        j = i - (1 if i > self.primary else 0)
        blk, r = divmod(j, OCC_BLOCK_BASES)
        row = self.idx.occ_blocks[blk]
        cnt = row[:4].astype(np.int64)
        if r:
            w = row[4:].astype(np.uint32)
            shifts = 30 - 2 * np.arange(16, dtype=np.uint32)
            bases = ((w[:, None] >> shifts[None, :]) & 3).reshape(-1)[:r]
            cnt += np.bincount(bases, minlength=4).astype(np.int64)
        return cnt

    def sa_lookup(self, row: int) -> int:
        """SA$[row] via LF walk to a text-position-sampled row."""
        idx = self.idx
        steps = 0
        while True:
            blk, r = divmod(row, 64)
            b = idx.ssa_blocks[blk]
            word = int(b[1]) if r < 32 else int(b[2])
            bit = r & 31
            if (word >> bit) & 1:
                rank = int(b[0])
                rank += bin(int(b[1]) & ((1 << min(r, 32)) - 1)).count("1")
                if r > 32:
                    rank += bin(int(b[2]) & ((1 << (r - 32)) - 1)).count("1")
                hi = (int(idx.ssa_vals_hi[rank])
                      if idx.ssa_vals_hi is not None else 0)
                return ((hi << 32) | int(idx.ssa_vals[rank])) + steps
            row = self.lf(row)
            steps += 1

    def lf(self, row: int) -> int:
        """LF mapping over BWT$ rows; LF(primary) = 0."""
        if row == self.primary:
            return 0
        j = row - (1 if row > self.primary else 0)
        blk, r = divmod(j, OCC_BLOCK_BASES)
        rowdata = self.idx.occ_blocks[blk]
        w = int(rowdata[4 + (r >> 4)])
        c = (w >> (30 - 2 * (r & 15))) & 3
        return int(self.L2[c]) + 1 + int(self.occ4(row)[c])

    # ---- bi-interval extension ----

    def set_intv(self, c: int) -> BiInterval:
        return BiInterval(
            k=int(self.L2[c]) + 1,
            l=int(self.L2[3 - c]) + 1,
            s=int(self.L2[c + 1] - self.L2[c]),
        )

    def extend_backward(self, iv: BiInterval) -> list[BiInterval]:
        """All four backward extensions (prepend base c), c = 0..3."""
        ok = self.occ4(iv.k)
        ol = self.occ4(iv.k + iv.s)
        cnt = ol - ok
        cnt_sent = 1 if iv.k <= self.primary < iv.k + iv.s else 0
        out = []
        for c in range(4):
            k_new = int(self.L2[c]) + 1 + int(ok[c])
            s_new = int(cnt[c])
            l_new = iv.l + cnt_sent + int(cnt[c + 1:].sum())
            out.append(BiInterval(k_new, l_new, s_new, iv.start, iv.end))
        return out

    def extend_forward(self, iv: BiInterval) -> list[BiInterval]:
        """All four forward extensions (append base b), b = 0..3."""
        swapped = BiInterval(iv.l, iv.k, iv.s, iv.start, iv.end)
        back = self.extend_backward(swapped)
        return [
            BiInterval(back[3 - b].l, back[3 - b].k, back[3 - b].s,
                       iv.start, iv.end)
            for b in range(4)
        ]

    # ---- SMEM search (bwt_smem1 semantics, min_intv = 1) ----

    def smem1(self, q: np.ndarray, x: int, min_intv: int = 1):
        """SMEMs through pivot x. Returns (next_x, [BiInterval])."""
        n = len(q)
        if q[x] >= 4:
            return x + 1, []
        iv = self.set_intv(int(q[x]))
        ik = BiInterval(iv.k, iv.l, iv.s, x, x + 1)
        curr: list[BiInterval] = []
        i = x + 1
        while i < n:
            if q[i] < 4:
                ok = self.extend_forward(ik)[int(q[i])]
                if ok.s != ik.s:
                    curr.append(ik)
                    if ok.s < min_intv:
                        break
                ik = BiInterval(ok.k, ok.l, ok.s, x, i + 1)
                i += 1
            else:
                curr.append(ik)
                break
        if i == n:
            curr.append(ik)
        ret = curr[-1].end  # longest match end (last pushed has max end)
        prev = curr[::-1]   # longest first
        mems: list[BiInterval] = []
        i = x - 1
        while i >= -1:
            c = -1 if i < 0 or q[i] >= 4 else int(q[i])
            curr = []
            for p in prev:
                ok = self.extend_backward(p)[c] if c >= 0 else None
                if c < 0 or ok.s < min_intv:
                    if not curr:
                        if not mems or i + 1 < mems[-1].start:
                            mems.append(
                                BiInterval(p.k, p.l, p.s, i + 1, p.end))
                else:
                    if not curr or ok.s != curr[-1].s:
                        curr.append(
                            BiInterval(ok.k, ok.l, ok.s, i + 1, p.end))
            if not curr:
                break
            prev = curr
            i -= 1
        mems.reverse()  # sorted by start coordinate
        return ret, mems

    def collect_smems(self, q: np.ndarray, min_seed_len: int = 19,
                      min_intv: int = 1) -> list[BiInterval]:
        """mem_collect_intv loop (reference: src/bwamem.c:240-257),
        fork defaults: seed_type=1 (SMEM), no re-seeding."""
        q = np.asarray(q)
        x = 0
        out: list[BiInterval] = []
        while x < len(q):
            if q[x] < 4:
                x, mems = self.smem1(q, x, min_intv)
                out.extend(m for m in mems if m.end - m.start >= min_seed_len)
            else:
                x += 1
        out.sort(key=lambda m: (m.start, m.end))
        return out

    def seed_strategy1(self, q: np.ndarray, x: int, min_len: int,
                       max_intv: int):
        """LAST-like forward seed (vanilla bwa bwt_seed_strategy1,
        reference tree: bwa_index/bwt.c:434-455): walk forward from x;
        the first time the interval drops below max_intv with match
        length > min_len, emit ONE seed [x, i+1) and stop.
        Returns (next_x, BiInterval | None) — None when the emitted
        interval is empty or the walk hit an N / the read end."""
        n = len(q)
        if q[x] >= 4:
            return x + 1, None
        ik = self.set_intv(int(q[x]))
        for i in range(x + 1, n):
            if q[i] >= 4:
                return i + 1, None
            ok = self.extend_forward(ik)[int(q[i])]
            if ok.s < max_intv and i - x >= min_len:
                m = BiInterval(ok.k, ok.l, ok.s, x, i + 1)
                return i + 1, (m if m.s > 0 else None)
            ik = ok
        return n, None

    def collect_intv_vanilla(self, q: np.ndarray, min_seed_len: int = 19,
                             split_factor: float = 1.5,
                             split_width: int = 10,
                             max_mem_intv: int = 20) -> list[BiInterval]:
        """Vanilla bwa's full 3-round mem_collect_intv (reference tree:
        bwa_index/bwamem.c:114-162): round 1 SMEMs, round 2 split re-seed
        of long low-occ SMEMs from their midpoint at min_intv = occ+1,
        round 3 LAST-like forward seeds below max_mem_intv occurrences.
        Result sorted by (start, end); duplicates are kept, as vanilla
        keeps them (chain containment absorbs the extra seeds)."""
        q = np.asarray(q)
        split_len = int(min_seed_len * split_factor + 0.499)
        out = self.collect_smems(q, min_seed_len)
        # round 2
        for p in list(out):
            if p.end - p.start < split_len or p.s > split_width:
                continue
            _, mems = self.smem1(q, (p.start + p.end) >> 1, p.s + 1)
            out.extend(m for m in mems if m.end - m.start >= min_seed_len)
        # round 3
        if max_mem_intv > 0:
            x = 0
            while x < len(q):
                if q[x] < 4:
                    x, m = self.seed_strategy1(q, x, min_seed_len,
                                               max_mem_intv)
                    if m is not None:
                        out.append(m)
                else:
                    x += 1
        out.sort(key=lambda m: (m.start, m.end))
        return out
