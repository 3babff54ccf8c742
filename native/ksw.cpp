// Banded global affine-gap alignment with CIGAR traceback.
//
// Algorithm: the 3-state (M/E/F) banded global DP of Heng Li's
// ksw_global2 (bwa, src/ksw.c — MIT license). The recurrence, the
// tie-breaking priority (diagonal beats a target gap beats a query gap
// on equal scores; gap EXTENSION wins only when strictly greater than a
// fresh open), the band boundary values, and the traceback state
// machine must match that kernel BIT-EXACTLY — vanilla bwa's CIGARs are
// the SAM-parity contract (reference: src/bwa.c:111-217 bwa_gen_cigar2
// -> src/ksw.c ksw_global2; score-only probe in mem_patch_reg,
// src/bwamem.c:612). The code itself is an independent restructuring of
// that contract: a two-row H matrix plus a per-column E (target-gap)
// state array instead of the packed rolling eh[] cell, direct score-
// matrix indexing instead of a query profile, and an explicit
// (source, extend-flags) traceback byte with its own layout.
// Semantics mirror the Python oracle in bwamem_tpu/oracle/ksw.py:
// ksw_global (a *declared* port of the reference kernel, test-only) so
// either can be swapped in; the oracle anchors the tests.
//
// API (ctypes):
//   int bm_ksw_global(const uint8_t* q, int32_t qlen,
//                     const uint8_t* t, int32_t tlen,
//                     const int8_t* mat /* m*m row-major */, int32_t m,
//                     int32_t o_del, int32_t e_del,
//                     int32_t o_ins, int32_t e_ins, int32_t w,
//                     int32_t* score_out,
//                     uint32_t* cigar_out /* (len<<4|op), may be null */,
//                     int32_t cigar_cap, int32_t* n_cigar_out);
//   returns 0 on success, -1 when cigar_cap is too small.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {
const int32_t NEG_INF = -0x40000000;
enum { OP_M = 0, OP_I = 1, OP_D = 2 };
// traceback byte: bits 0-1 = source of H at this cell (which also names
// the op emitted when the walker lands here in the H state); bit 6 =
// the NEXT row's E at this column extended an existing target gap;
// bit 7 = the NEXT column's F in this row extended an existing query gap
enum { SRC_DIAG = 0, SRC_DEL = 1, SRC_INS = 2 };
const uint8_t EXT_DEL = 1u << 6;
const uint8_t EXT_INS = 1u << 7;
}  // namespace

extern "C" int bm_ksw_global(
    const uint8_t* q, int32_t qlen, const uint8_t* t, int32_t tlen,
    const int8_t* mat, int32_t m, int32_t o_del, int32_t e_del,
    int32_t o_ins, int32_t e_ins, int32_t w, int32_t* score_out,
    uint32_t* cigar_out, int32_t cigar_cap, int32_t* n_cigar_out) {
  if (n_cigar_out) *n_cigar_out = 0;
  if (qlen == 0 || tlen == 0) {
    int32_t n = 0;
    if (cigar_out) {
      if (tlen) {
        if (n >= cigar_cap) return -1;
        cigar_out[n++] = (uint32_t)tlen << 4 | OP_D;
      }
      if (qlen) {
        if (n >= cigar_cap) return -1;
        cigar_out[n++] = (uint32_t)qlen << 4 | OP_I;
      }
    }
    if (n_cigar_out) *n_cigar_out = n;
    *score_out = (qlen || tlen) ? NEG_INF : 0;
    return 0;
  }
  // clamp: a band narrower than |tlen - qlen| cannot reach the corner
  // cell (the Python oracle clamps identically; bwa leaves this to
  // callers — bwa_gen_cigar2 sets w >= |rlen - l_query| + 3 — and would
  // read stale cells otherwise)
  int32_t dlen = tlen > qlen ? tlen - qlen : qlen - tlen;
  if (w < dlen) w = dlen;
  const int32_t oe_del = o_del + e_del, oe_ins = o_ins + e_ins;
  const int64_t n_col = qlen < 2 * (int64_t)w + 1 ? qlen : 2 * (int64_t)w + 1;
  const bool want_cigar = cigar_out != nullptr;

  // Hrow[j] = best score aligning the first i target bases with the
  // first j query bases (j in 0..qlen); Ecol[j] = score of the best such
  // alignment ending in a target-consuming gap, carried down the rows.
  // One row of lookahead (Hprev) replaces the packed rolling cell; the
  // band only ever moves right, so columns outside it keep NEG_INF.
  std::vector<int32_t> Hprev(qlen + 2, NEG_INF), Hcur(qlen + 2, NEG_INF);
  std::vector<int32_t> Ecol(qlen + 2, NEG_INF);
  std::vector<uint8_t> tb;
  if (want_cigar) tb.assign((size_t)tlen * n_col, 0);

  // top boundary (row "before the first target base"): leading query gap
  Hprev[0] = 0;
  int32_t jmax0 = qlen < w ? qlen : w;
  for (int32_t j = 1; j <= jmax0; ++j) Hprev[j] = -(o_ins + e_ins * j);

  for (int32_t i = 0; i < tlen; ++i) {
    const int8_t* srow = &mat[(size_t)t[i] * m];
    int32_t beg = i - w > 0 ? i - w : 0;
    int32_t end = i + w + 1 < qlen ? i + w + 1 : qlen;
    // left boundary: a pure leading target gap when the band touches
    // column 0, unreachable otherwise
    Hcur[beg] = beg == 0 ? -(o_del + e_del * (i + 1)) : NEG_INF;
    int32_t F = NEG_INF;  // query-consuming gap state, swept along the row
    uint8_t* tbrow = want_cigar ? &tb[(size_t)i * n_col] : nullptr;
    for (int32_t j = beg; j < end; ++j) {
      // cell (i, j): consumes target base i and query base j (0-based)
      const int32_t diag = Hprev[j] + srow[q[j]];
      const int32_t edel = Ecol[j];
      // selection priority (must match the contract exactly): the
      // diagonal beats a target gap on ties; that winner beats a query
      // gap on ties
      int32_t best;
      uint8_t src;
      if (diag >= edel) {
        best = diag;
        src = SRC_DIAG;
      } else {
        best = edel;
        src = SRC_DEL;
      }
      if (F > best) {
        best = F;
        src = SRC_INS;
      }
      Hcur[j + 1] = best;
      // gap states for the NEXT cell open from the DIAGONAL candidate
      // only (3-state formulation: E/F never open from each other), and
      // an extension survives only when strictly better than a re-open
      const int32_t e_open = diag - oe_del;
      const int32_t e_ext = edel - e_del;
      if (e_ext > e_open) {
        Ecol[j] = e_ext;
        src |= EXT_DEL;
      } else {
        Ecol[j] = e_open;
      }
      const int32_t f_open = diag - oe_ins;
      const int32_t f_ext = F - e_ins;
      if (f_ext > f_open) {
        F = f_ext;
        src |= EXT_INS;
      } else {
        F = f_open;
      }
      if (want_cigar) tbrow[j - beg] = src;
    }
    // the column just right of the band enters next row's band with no
    // live E state
    Ecol[end] = NEG_INF;
    Hcur.swap(Hprev);  // Hprev now holds row i
  }
  *score_out = Hprev[qlen];

  if (want_cigar) {
    // traceback: a 3-state walker. The state names the op consumed at
    // the current step; in the H state the cell's source bits pick the
    // next state, in a gap state the cell's extend flag decides between
    // staying in the gap and returning to H.
    std::vector<uint8_t> ops;
    ops.reserve(qlen + tlen);
    int32_t st = SRC_DIAG;
    int32_t i = tlen - 1;
    int32_t k = (i + w + 1 < qlen ? i + w + 1 : qlen) - 1;
    while (i >= 0 && k >= 0) {
      int32_t beg = i - w > 0 ? i - w : 0;
      const uint8_t cell = tb[(size_t)i * n_col + (k - beg)];
      if (st == SRC_DIAG) {
        st = cell & 3;
      } else if (st == SRC_DEL) {
        st = (cell & EXT_DEL) ? SRC_DEL : SRC_DIAG;
      } else {
        st = (cell & EXT_INS) ? SRC_INS : SRC_DIAG;
      }
      if (st == SRC_DIAG) {
        ops.push_back(OP_M);
        --i;
        --k;
      } else if (st == SRC_DEL) {
        ops.push_back(OP_D);
        --i;
      } else {
        ops.push_back(OP_I);
        --k;
      }
    }
    for (; i >= 0; --i) ops.push_back(OP_D);
    for (; k >= 0; --k) ops.push_back(OP_I);
    // reverse + run-length encode
    int32_t n = 0;
    for (int64_t p = (int64_t)ops.size() - 1; p >= 0;) {
      uint8_t op = ops[p];
      int64_t run = 0;
      while (p >= 0 && ops[p] == op) {
        ++run;
        --p;
      }
      if (n >= cigar_cap) return -1;
      cigar_out[n++] = (uint32_t)run << 4 | op;
    }
    *n_cigar_out = n;
  }
  return 0;
}
