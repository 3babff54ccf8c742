// Banded global affine-gap alignment with CIGAR traceback, written from
// scratch for the bwamem_tpu host runtime.
//
// Role in the framework: CIGAR/NM/MD generation for the handful of final
// alignments per read (the reference runs ksw_global2 on the CPU for the
// same purpose, reference: src/bwa.c:111-217 bwa_gen_cigar2 ->
// src/ksw.c ksw_global2) and the score-only probe in mem_patch_reg
// (reference: src/bwamem.c:612). Semantics mirror the Python oracle in
// bwamem_tpu/oracle/ksw.py:ksw_global (same init, same traceback
// tie-breaking) so either can be swapped in; the oracle anchors the tests.
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
  // clamp: a band narrower than |tlen - qlen| cannot reach the corner cell
  // (the Python oracle clamps identically; the reference leaves this to
  // callers and would read stale cells otherwise)
  int32_t dlen = tlen > qlen ? tlen - qlen : qlen - tlen;
  if (w < dlen) w = dlen;
  const int32_t oe_del = o_del + e_del, oe_ins = o_ins + e_ins;
  const int64_t n_col = qlen < 2 * (int64_t)w + 1 ? qlen : 2 * (int64_t)w + 1;
  const bool want_cigar = cigar_out != nullptr;

  std::vector<int32_t> eh_h(qlen + 2, NEG_INF), eh_e(qlen + 2, NEG_INF);
  std::vector<uint8_t> z;
  if (want_cigar) z.assign((size_t)tlen * n_col, 0);

  eh_h[0] = 0;
  int32_t jmax0 = qlen < w ? qlen : w;
  for (int32_t j = 1; j <= jmax0; ++j) eh_h[j] = -(o_ins + e_ins * j);

  // per-row score profile
  std::vector<int32_t> qp((size_t)m * qlen);
  for (int32_t c = 0; c < m; ++c)
    for (int32_t j = 0; j < qlen; ++j)
      qp[(size_t)c * qlen + j] = mat[c * m + q[j]];

  for (int32_t i = 0; i < tlen; ++i) {
    int32_t f = NEG_INF;
    const int32_t* qrow = &qp[(size_t)t[i] * qlen];
    int32_t beg = i - w > 0 ? i - w : 0;
    int32_t end = i + w + 1 < qlen ? i + w + 1 : qlen;
    int32_t h1 = beg == 0 ? -(o_del + e_del * (i + 1)) : NEG_INF;
    uint8_t* zrow = want_cigar ? &z[(size_t)i * n_col] : nullptr;
    for (int32_t j = beg; j < end; ++j) {
      int32_t M = eh_h[j], e = eh_e[j];
      eh_h[j] = h1;
      M += qrow[j];
      uint8_t d = M >= e ? 0 : 1;
      int32_t h = M >= e ? M : e;
      d = h >= f ? d : 2;
      h = h >= f ? h : f;
      h1 = h;
      int32_t tt = M - oe_del;
      e -= e_del;
      d |= e > tt ? (uint8_t)(1 << 2) : 0;
      e = e > tt ? e : tt;
      eh_e[j] = e;
      tt = M - oe_ins;
      f -= e_ins;
      d |= f > tt ? (uint8_t)(2 << 4) : 0;
      f = f > tt ? f : tt;
      if (want_cigar) zrow[j - beg] = d;
    }
    eh_h[end] = h1;
    eh_e[end] = NEG_INF;
  }
  *score_out = eh_h[qlen];

  if (want_cigar) {
    // traceback (same tie-breaking as the oracle / reference)
    std::vector<uint8_t> ops;
    ops.reserve(qlen + tlen);
    int32_t which = 0;
    int32_t i = tlen - 1;
    int32_t k = (i + w + 1 < qlen ? i + w + 1 : qlen) - 1;
    while (i >= 0 && k >= 0) {
      int32_t beg = i - w > 0 ? i - w : 0;
      which = (z[(size_t)i * n_col + (k - beg)] >> (which << 1)) & 3;
      if (which == 0) {
        ops.push_back(OP_M);
        --i;
        --k;
      } else if (which == 1) {
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
