// Shared reg2aln numeric core: band inference, banded-global CIGAR,
// NM/MD generation and the band-growth retry loop. Included by both the
// batch solver (reg2aln.cpp) and the native SAM emitter (samemit.cpp).
// Reference semantics: src/bwamem.c:2344-2438 mem_reg2aln ->
// src/bwa.c:111-217 bwa_gen_cigar2.
#pragma once
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <utility>
#include <vector>

extern "C" int bm_ksw_global(
    const uint8_t* q, int32_t qlen, const uint8_t* t, int32_t tlen,
    const int8_t* mat, int32_t m, int32_t o_del, int32_t e_del,
    int32_t o_ins, int32_t e_ins, int32_t w, int32_t* score_out,
    uint32_t* cigar_out, int32_t cigar_cap, int32_t* n_cigar_out);

namespace bm_core {

enum { OP_M = 0, OP_I = 1, OP_D = 2 };

inline int32_t base_fwd(const uint32_t* pac, int64_t p) {
  return (int32_t)((pac[p >> 4] >> (30 - 2 * (p & 15))) & 3);
}

// infer_bw (reference: src/bwamem.c:1483-1491)
inline int32_t infer_bw(int32_t l1, int32_t l2, int32_t score, int32_t a,
                        int32_t q, int32_t r) {
  if (l1 == l2 && l1 * a - score < ((q + r - a) << 1)) return 0;
  int32_t mn = l1 < l2 ? l1 : l2;
  int32_t w = (int32_t)((double)(mn * a - score - q) / r + 2.0);
  int32_t d = l1 > l2 ? l1 - l2 : l2 - l1;
  return w > d ? w : d;
}

// one gen_cigar evaluation; returns false only on cigar scratch overflow
// (scratch is sized qlen+rlen+2, which bm_ksw_global never exceeds)
struct GenOut {
  int32_t score = 0;
  int32_t nm = -1;            // -1 = no alignment (bad window)
  std::vector<uint32_t> cig;  // (len<<4 | op)
  std::string md;
};

inline void gen_cigar(const uint32_t* pac, int64_t l_pac, const int8_t* mat,
               int32_t o_del, int32_t e_del, int32_t o_ins, int32_t e_ins,
               const uint8_t* query, int32_t l_query, int64_t rb, int64_t re,
               int32_t w_, GenOut* out) {
  out->score = 0;
  out->nm = -1;
  out->cig.clear();
  out->md.clear();
  if (l_query <= 0 || rb >= re || (rb < l_pac && l_pac < re)) return;
  const int64_t rlen = re - rb;
  const bool is_rev = rb >= l_pac;

  // fetch the window; reverse both sequences on the reverse strand so
  // indels land at the leftmost position (same as the Python twin)
  std::vector<uint8_t> rseq((size_t)rlen);
  if (!is_rev) {
    for (int64_t p = rb; p < re; ++p)
      rseq[(size_t)(p - rb)] = (uint8_t)base_fwd(pac, p);
  } else {
    for (int64_t p = rb; p < re; ++p)
      rseq[(size_t)(p - rb)] =
          (uint8_t)(3 - base_fwd(pac, 2 * l_pac - 1 - p));
    // reversed window order
    for (int64_t i = 0, j = rlen - 1; i < j; ++i, --j)
      std::swap(rseq[(size_t)i], rseq[(size_t)j]);
  }
  std::vector<uint8_t> q((size_t)l_query);
  if (!is_rev)
    std::memcpy(q.data(), query, (size_t)l_query);
  else
    for (int32_t j = 0; j < l_query; ++j) q[j] = query[l_query - 1 - j];

  if ((int64_t)l_query == rlen && w_ == 0) {
    out->cig.push_back((uint32_t)l_query << 4 | OP_M);
    int32_t sc = 0;
    for (int32_t j = 0; j < l_query; ++j) sc += mat[rseq[j] * 5 + q[j]];
    out->score = sc;
  } else {
    const int32_t am = mat[0];
    int32_t max_ins =
        (int32_t)((double)(((l_query + 1) >> 1) * am - o_ins) / e_ins + 1.0);
    int32_t max_del =
        (int32_t)((double)(((l_query + 1) >> 1) * am - o_del) / e_del + 1.0);
    int32_t max_gap = max_ins > max_del ? max_ins : max_del;
    if (max_gap < 1) max_gap = 1;
    int64_t dl = rlen > l_query ? rlen - l_query : l_query - rlen;
    int32_t w = (int32_t)((max_gap + dl + 1) >> 1);
    if (w > w_) w = w_;
    if (w < (int32_t)dl + 3) w = (int32_t)dl + 3;
    int32_t cap = l_query + (int32_t)rlen + 2;
    out->cig.resize((size_t)cap);
    int32_t n_cigar = 0, score = 0;
    bm_ksw_global(q.data(), l_query, rseq.data(), (int32_t)rlen, mat, 5,
                  o_del, e_del, o_ins, e_ins, w, &score, out->cig.data(),
                  cap, &n_cigar);
    out->cig.resize((size_t)n_cigar);
    out->score = score;
  }

  // NM / MD (same traversal as the Python twin)
  static const char FWD[5] = {'A', 'C', 'G', 'T', 'N'};
  static const char REV[5] = {'T', 'G', 'C', 'A', 'N'};
  const char* int2base = is_rev ? REV : FWD;
  char buf[16];
  int64_t x = 0, y = 0;
  int32_t u = 0, n_mm = 0, n_gap = 0;
  const size_t nc = out->cig.size();
  for (size_t k = 0; k < nc; ++k) {
    uint32_t c = out->cig[k];
    int32_t op = (int32_t)(c & 0xF), ln = (int32_t)(c >> 4);
    if (op == OP_M) {
      int32_t prev = -1, last = -1, cnt = 0;
      for (int32_t i = 0; i < ln; ++i) {
        if (q[(size_t)(x + i)] != rseq[(size_t)(y + i)]) {
          int len = std::snprintf(buf, sizeof buf, "%d", u + i - prev - 1);
          out->md.append(buf, (size_t)len);
          out->md.push_back(int2base[rseq[(size_t)(y + i)]]);
          prev = i;
          u = 0;
          last = i;
          ++cnt;
        }
      }
      n_mm += cnt;
      if (cnt)
        u = ln - 1 - last;
      else
        u += ln;
      x += ln;
      y += ln;
    } else if (op == OP_D) {
      if (k > 0 && k + 1 < nc) {
        int len = std::snprintf(buf, sizeof buf, "%d", u);
        out->md.append(buf, (size_t)len);
        out->md.push_back('^');
        for (int32_t i = 0; i < ln; ++i)
          out->md.push_back(int2base[rseq[(size_t)(y + i)]]);
        u = 0;
        n_gap += ln;
      }
      y += ln;
    } else if (op == OP_I) {
      x += ln;
      n_gap += ln;
    }
  }
  int len = std::snprintf(buf, sizeof buf, "%d", u);
  out->md.append(buf, (size_t)len);
  out->nm = n_mm + n_gap;
}

}  // namespace bm_core

namespace bm_core {

// the band-growth retry loop around gen_cigar
// (reference: src/bwamem.c:2386-2398)
inline void solve_record(const uint32_t* pac, int64_t l_pac,
                         const int8_t* mat, int32_t o_del, int32_t e_del,
                         int32_t o_ins, int32_t e_ins, int32_t a,
                         int32_t w_opt, const uint8_t* q, int32_t lq,
                         int64_t rb, int64_t re, int32_t truesc,
                         int32_t ar_w, GenOut* g) {
  const int64_t rlen = re - rb;
  int32_t w2 = infer_bw(lq, (int32_t)rlen, truesc, a, o_del, e_del);
  int32_t w2b = infer_bw(lq, (int32_t)rlen, truesc, a, o_ins, e_ins);
  if (w2b > w2) w2 = w2b;
  if (w2 > w_opt) w2 = w2 < ar_w ? w2 : ar_w;
  int32_t last_sc = -(1 << 30);
  int32_t i = 0;
  for (;;) {
    w2 = w2 < (w_opt << 2) ? w2 : (w_opt << 2);
    gen_cigar(pac, l_pac, mat, o_del, e_del, o_ins, e_ins, q, lq, rb, re,
              w2, g);
    if (g->score == last_sc || w2 == (w_opt << 2)) break;
    last_sc = g->score;
    w2 <<= 1;
    ++i;
    if (!(i < 3 && g->score < truesc - a)) break;
  }
}

}  // namespace bm_core
