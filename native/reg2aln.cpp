// Batched final-alignment generation (CIGAR + NM + MD) for the host
// emit stage, written from scratch for the bwamem_tpu runtime.
//
// Role in the framework: the per-record numeric core of mem_reg2aln —
// band inference, the grow-band retry loop, reference window fetch from
// the packed 2-bit genome, banded global DP, and NM/MD generation
// (reference: src/bwamem.c:2344-2438 mem_reg2aln -> src/bwa.c:111-217
// bwa_gen_cigar2). The Python twin lives in
// bwamem_tpu/pipeline/samgen.py (gen_cigar / _reg2aln_solve_scalar) and
// anchors the tests; this kernel must match it bit-for-bit.
//
// API (ctypes):
//   int bm_reg2aln_batch(
//       const uint32_t* pac, int64_t l_pac,
//       const int8_t* mat /* 5x5 row-major */,
//       int32_t o_del, int32_t e_del, int32_t o_ins, int32_t e_ins,
//       int32_t a, int32_t w_opt,
//       int64_t n,
//       const uint8_t* qstream, const int64_t* q_off, const int32_t* q_len,
//       const int64_t* rb, const int64_t* re,
//       const int32_t* truesc, const int32_t* ar_w,
//       int32_t* nm_out,
//       uint32_t* cig_pool, int64_t cig_cap,
//       int64_t* cig_off, int32_t* cig_n,
//       char* md_pool, int64_t md_cap,
//       int64_t* md_off, int32_t* md_len);
//   returns 0 on success, 1 if a pool overflowed (caller doubles + retries).

#include "reg2aln_core.h"

using bm_core::GenOut;
using bm_core::infer_bw;
using bm_core::gen_cigar;



extern "C" int bm_reg2aln_batch(
    const uint32_t* pac, int64_t l_pac, const int8_t* mat, int32_t o_del,
    int32_t e_del, int32_t o_ins, int32_t e_ins, int32_t a, int32_t w_opt,
    int64_t n, const uint8_t* qstream, const int64_t* q_off,
    const int32_t* q_len, const int64_t* rb, const int64_t* re,
    const int32_t* truesc, const int32_t* ar_w, int32_t* nm_out,
    uint32_t* cig_pool, int64_t cig_cap, int64_t* cig_off, int32_t* cig_n,
    char* md_pool, int64_t md_cap, int64_t* md_off, int32_t* md_len) {
  int64_t cpos = 0, mpos = 0;
  GenOut g;
  for (int64_t rec = 0; rec < n; ++rec) {
    const uint8_t* q = qstream + q_off[rec];
    const int32_t lq = q_len[rec];
    const int64_t rlen = re[rec] - rb[rec];
    // band-growth retry loop (reference: src/bwamem.c:2386-2398)
    int32_t w2 = infer_bw(lq, (int32_t)rlen, truesc[rec], a, o_del, e_del);
    int32_t w2b = infer_bw(lq, (int32_t)rlen, truesc[rec], a, o_ins, e_ins);
    if (w2b > w2) w2 = w2b;
    if (w2 > w_opt) w2 = w2 < ar_w[rec] ? w2 : ar_w[rec];
    int32_t last_sc = -(1 << 30);
    int32_t i = 0;
    for (;;) {
      w2 = w2 < (w_opt << 2) ? w2 : (w_opt << 2);
      gen_cigar(pac, l_pac, mat, o_del, e_del, o_ins, e_ins, q, lq, rb[rec],
                re[rec], w2, &g);
      if (g.score == last_sc || w2 == (w_opt << 2)) break;
      last_sc = g.score;
      w2 <<= 1;
      ++i;
      if (!(i < 3 && g.score < truesc[rec] - a)) break;
    }
    if (cpos + (int64_t)g.cig.size() > cig_cap ||
        mpos + (int64_t)g.md.size() > md_cap)
      return 1;
    nm_out[rec] = g.nm;
    cig_off[rec] = cpos;
    cig_n[rec] = (int32_t)g.cig.size();
    std::memcpy(cig_pool + cpos, g.cig.data(),
                g.cig.size() * sizeof(uint32_t));
    cpos += (int64_t)g.cig.size();
    md_off[rec] = mpos;
    md_len[rec] = (int32_t)g.md.size();
    std::memcpy(md_pool + mpos, g.md.data(), g.md.size());
    mpos += (int64_t)g.md.size();
  }
  return 0;
}
