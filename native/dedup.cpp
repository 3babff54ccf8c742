// Batched region dedup + patch for the fast collect path, written from
// scratch for the bwamem_tpu host runtime.
//
// Role in the framework: mem_sort_dedup_patch over the flat region
// arrays the native chain2aln path produces, before any Python objects
// exist (reference: src/bwamem.c:580-680 mem_patch_reg +
// mem_sort_dedup_patch). The Python twin in
// bwamem_tpu/pipeline/regions.py stays as the oracle and as the path
// for object-based callers (mate rescue's patch=false dedup, long-read
// fallback).
//
// API (ctypes, all pointers void*-compatible):
//   int bm_dedup_patch_batch(
//     const uint32_t* pac, int64_t l_pac, const int8_t* mat /*5x5*/,
//     int32_t o_del, int32_t e_del, int32_t o_ins, int32_t e_ins,
//     int32_t w_opt, int64_t max_chain_gap, double mask_level_redun,
//     int64_t n_reads,
//     const int64_t* reg_off,      // n_reads+1: regs of read b = [off[b], off[b+1])
//     const uint8_t* qstream,      // concatenated read codes
//     const int64_t* q_off,        // n_reads: read b codes at q_off[b]
//     int64_t* rb, int64_t* re, int32_t* qb, int32_t* qe,  // in/out
//     int32_t* score, int32_t* truesc, int32_t* w_,
//     int32_t* seedcov, int32_t* sub, int32_t* csub, int32_t* n_comp,
//     const int32_t* rid,
//     int32_t* out_idx,            // flat capacity n_regs: survivor flat
//                                  // indices, per read in final order
//     int32_t* out_cnt);           // n_reads: survivors per read
//   returns 0.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

extern "C" int bm_ksw_global(
    const uint8_t* q, int32_t qlen, const uint8_t* t, int32_t tlen,
    const int8_t* mat, int32_t m, int32_t o_del, int32_t e_del,
    int32_t o_ins, int32_t e_ins, int32_t w, int32_t* score_out,
    uint32_t* cigar_out, int32_t cigar_cap, int32_t* n_cigar_out);

namespace {

const double PATCH_MAX_R_BW = 0.05;    // reference: src/bwamem.c
const double PATCH_MIN_SC_RATIO = 0.90;

inline int32_t base_fwd(const uint32_t* pac, int64_t p) {
  return (int32_t)((pac[p >> 4] >> (30 - 2 * (p & 15))) & 3);
}

// score-only banded global over [rb, re) in doubled coords (the
// mem_patch_reg probe; reference: src/bwamem.c:612). Window never
// bridges the strand boundary (caller pre-checks).
int32_t gen_score(const uint32_t* pac, int64_t l_pac, const int8_t* mat,
                  int32_t o_del, int32_t e_del, int32_t o_ins,
                  int32_t e_ins, const uint8_t* query, int32_t l_query,
                  int64_t rb, int64_t re, int32_t w) {
  const int64_t rlen = re - rb;
  const bool is_rev = rb >= l_pac;
  std::vector<uint8_t> rseq((size_t)rlen);
  if (!is_rev) {
    for (int64_t p = rb; p < re; ++p)
      rseq[(size_t)(p - rb)] = (uint8_t)base_fwd(pac, p);
  } else {
    for (int64_t p = rb; p < re; ++p)
      rseq[(size_t)(p - rb)] =
          (uint8_t)(3 - base_fwd(pac, 2 * l_pac - 1 - p));
    for (int64_t i = 0, j = rlen - 1; i < j; ++i, --j)
      std::swap(rseq[(size_t)i], rseq[(size_t)j]);
  }
  std::vector<uint8_t> q((size_t)l_query);
  if (!is_rev)
    for (int32_t j = 0; j < l_query; ++j) q[j] = query[j];
  else
    for (int32_t j = 0; j < l_query; ++j) q[j] = query[l_query - 1 - j];
  int32_t sc = 0, nc = 0;
  bm_ksw_global(q.data(), l_query, rseq.data(), (int32_t)rlen, mat, 5,
                o_del, e_del, o_ins, e_ins, w, &sc, nullptr, 0, &nc);
  return sc;
}

}  // namespace

extern "C" int bm_dedup_patch_batch(
    const uint32_t* pac, int64_t l_pac, const int8_t* mat, int32_t o_del,
    int32_t e_del, int32_t o_ins, int32_t e_ins, int32_t w_opt,
    int64_t max_chain_gap, double mask_level_redun, int64_t n_reads,
    const int64_t* reg_off, const uint8_t* qstream, const int64_t* q_off,
    int64_t* rb, int64_t* re, int32_t* qb, int32_t* qe, int32_t* score,
    int32_t* truesc, int32_t* w_, int32_t* seedcov, int32_t* sub,
    int32_t* csub, int32_t* n_comp, const int32_t* rid, int32_t* out_idx,
    int32_t* out_cnt) {
  std::vector<int32_t> order;
  for (int64_t b = 0; b < n_reads; ++b) {
    const int64_t lo = reg_off[b], hi = reg_off[b + 1];
    const int64_t n = hi - lo;
    int32_t* out = out_idx + lo;
    if (n <= 0) {
      out_cnt[b] = 0;
      continue;
    }
    if (n == 1) {
      n_comp[lo] = 1;
      out[0] = (int32_t)lo;
      out_cnt[b] = 1;
      continue;
    }
    const uint8_t* query = qstream + q_off[b];
    order.clear();
    for (int64_t k = lo; k < hi; ++k) order.push_back((int32_t)k);
    // sort by END position (reference: alnreg_slt2)
    std::stable_sort(order.begin(), order.end(),
                     [&](int32_t x, int32_t y) { return re[x] < re[y]; });
    for (int32_t k : order) n_comp[k] = 1;
    for (int64_t i = 1; i < n; ++i) {
      const int32_t p = order[(size_t)i];
      if (rid[p] != rid[order[(size_t)i - 1]] ||
          rb[p] >= re[order[(size_t)i - 1]] + max_chain_gap)
        continue;
      for (int64_t j = i - 1; j >= 0; --j) {
        const int32_t q_ = order[(size_t)j];
        if (!(rid[p] == rid[q_] && rb[p] < re[q_] + max_chain_gap)) break;
        if (qe[q_] == qb[q_]) continue;  // excluded
        const int64_t pr = re[q_] - rb[p];
        const int64_t pq =
            qb[q_] < qb[p] ? (int64_t)qe[q_] - qb[p] : (int64_t)qe[p] - qb[q_];
        const int64_t mr =
            std::min(re[q_] - rb[q_], re[p] - rb[p]);
        const int64_t mq = std::min((int64_t)qe[q_] - qb[q_],
                                    (int64_t)qe[p] - qb[p]);
        if ((double)pr > mask_level_redun * (double)mr &&
            (double)pq > mask_level_redun * (double)mq) {
          if (score[p] < score[q_]) {
            qe[p] = qb[p];
            break;
          } else {
            qe[q_] = qb[q_];
          }
        } else if (rb[q_] < rb[p]) {
          // mem_patch_reg(a=q_, b=p) (reference: src/bwamem.c:580-618)
          const int32_t a = q_, bI = p;
          if (rb[a] < l_pac && rb[bI] >= l_pac) continue;
          if (qb[a] >= qb[bI] || qe[a] >= qe[bI] || re[a] >= re[bI])
            continue;
          int64_t wd = std::llabs((re[a] - rb[bI]) -
                                  ((int64_t)qe[a] - qb[bI]));
          double r = std::fabs(
              (double)(re[a] - rb[bI]) / (double)(re[bI] - rb[a]) -
              (double)((int64_t)qe[a] - qb[bI]) /
                  (double)((int64_t)qe[bI] - qb[a]));
          if (re[a] < rb[bI] || qe[a] < qb[bI]) {
            if (wd > ((int64_t)w_opt << 1) || r >= PATCH_MAX_R_BW)
              continue;
          } else if (wd > ((int64_t)w_opt << 2) ||
                     r >= PATCH_MAX_R_BW * 2) {
            continue;
          }
          int64_t wtot = wd + w_[a] + w_[bI];
          if (wtot > ((int64_t)w_opt << 2)) wtot = (int64_t)w_opt << 2;
          const int32_t sc = gen_score(
              pac, l_pac, mat, o_del, e_del, o_ins, e_ins,
              query + qb[a], qe[bI] - qb[a], rb[a], re[bI],
              (int32_t)wtot);
          const int32_t q_s = (int32_t)(
              (double)((int64_t)qe[bI] - qb[a]) /
                  (double)(((int64_t)qe[bI] - qb[bI]) +
                           ((int64_t)qe[a] - qb[a])) *
                  (double)(score[bI] + score[a]) +
              0.499);
          const int32_t r_s = (int32_t)(
              (double)(re[bI] - rb[a]) /
                  (double)((re[bI] - rb[bI]) + (re[a] - rb[a])) *
                  (double)(score[bI] + score[a]) +
              0.499);
          if ((double)sc / (double)std::max(q_s, r_s) <
              PATCH_MIN_SC_RATIO)
            continue;
          n_comp[bI] += n_comp[a] + 1;
          if (seedcov[a] > seedcov[bI]) seedcov[bI] = seedcov[a];
          if (sub[a] > sub[bI]) sub[bI] = sub[a];
          if (csub[a] > csub[bI]) csub[bI] = csub[a];
          qb[bI] = qb[a];
          rb[bI] = rb[a];
          truesc[bI] = score[bI] = sc;
          w_[bI] = (int32_t)wtot;
          qb[a] = qe[a];
        }
      }
    }
    // survivors, sorted by (score desc, rb, qb) (reference: alnreg_slt)
    std::vector<int32_t> surv;
    for (int32_t k : order)
      if (qe[k] > qb[k]) surv.push_back(k);
    std::stable_sort(surv.begin(), surv.end(), [&](int32_t x, int32_t y) {
      if (score[x] != score[y]) return score[x] > score[y];
      if (rb[x] != rb[y]) return rb[x] < rb[y];
      return qb[x] < qb[y];
    });
    for (size_t i = 1; i < surv.size(); ++i) {
      const int32_t c = surv[i], pvd = surv[i - 1];
      if (score[c] == score[pvd] && rb[c] == rb[pvd] && qb[c] == qb[pvd])
        qe[c] = qb[c];
    }
    int32_t m = 0;
    for (size_t i = 0; i < surv.size(); ++i)
      if (i == 0 || qe[surv[i]] > qb[surv[i]]) out[m++] = surv[i];
    out_cnt[b] = m;
  }
  return 0;
}
