// Native single-end finalization: mark-primary, record selection, XA
// generation, CIGAR/NM/MD solving and SAM text assembly in ONE call over
// a slice of reads — the array-native replacement for the per-record
// Python emit path.
//
// Reference semantics replicated bit-for-bit (each cited):
//   * mem_mark_primary_se (+_core)        src/bwamem.c:686-761
//   * mem_approx_mapq_se                  src/bwamem.c:1690-1717
//   * mem_reg2sam selection + flag rules  src/bwamem.c:1721-1775
//   * mem_gen_alt (XA:Z)                  src/bwamem_extra.c
//   * mem_reg2aln coordinates/clips       src/bwamem.c:2344-2438
//   * mem_aln2sam (fields, SA:Z, tags)    src/bwamem.c:1506-1688
// The Python twins live in pipeline/regions.py and pipeline/samgen.py and
// anchor the differential tests.
//
// Output: one SAM text blob (every line '\n'-terminated, reads in input
// order). Returns 0 on success, 1 if the output buffer was too small
// (caller doubles and retries).

#include "reg2aln_core.h"

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

using bm_core::GenOut;
using bm_core::solve_record;

constexpr int32_t INT_MAX_SENTINEL = 1 << 30;
constexpr double MEM_MAPQ_COEF = 30.0;
const char CIGAR_CHARS[] = "MIDSH";
const char FWD_BASES[] = "ACGTN";
const char REV_BASES[] = "TGCAN";

// Thomas Wang 64-bit mix (reference: src/utils.h hash_64)
inline uint64_t hash_64(uint64_t key) {
  key += ~(key << 32);
  key ^= key >> 22;
  key += ~(key << 13);
  key ^= key >> 8;
  key += key << 3;
  key ^= key >> 15;
  key += ~(key << 27);
  key ^= key >> 31;
  return key;
}

struct Opt {
  int32_t a, b, o_del, e_del, o_ins, e_ins, w, T;
  int32_t min_seed_len, mask_level_redun_unused;
  double drop_ratio, XA_drop_ratio, mask_level;
  int32_t max_XA_hits, max_XA_hits_alt;
  int32_t mapQ_coef_len;
  double mapQ_coef_fac;
  int32_t flag_softclip, flag_all, flag_no_multi, flag_ref_hdr;
};

struct Reg {
  // post-dedup fields (one survivor region)
  int64_t rb, re;
  int32_t qb, qe, score, truesc, sub, csub, w, seedcov, rid;
  double frac_rep;
  bool is_alt;
  // mark-primary outputs
  int32_t secondary = -1, secondary_all = -1, sub_n = 0, alt_sc = 0;
  uint64_t hash = 0;
};

// mem_mark_primary_se_core (reference: src/bwamem.c:686-713) over a
// permutation `ord` of regs[0..n)
void mark_primary_core(const Opt& opt, std::vector<Reg>& regs,
                       const std::vector<int>& ord, size_t n_use) {
  const int32_t tmp = std::max(opt.a + opt.b,
                               std::max(opt.o_del + opt.e_del,
                                        opt.o_ins + opt.e_ins));
  std::vector<int> z;
  z.push_back(0);
  for (size_t i = 1; i < n_use; ++i) {
    Reg& ai = regs[ord[i]];
    bool placed = false;
    for (int kz : z) {
      Reg& ak = regs[ord[kz]];
      int32_t b_max = std::max(ak.qb, ai.qb);
      int32_t e_min = std::min(ak.qe, ai.qe);
      if (e_min > b_max) {
        int32_t min_l = std::min(ai.qe - ai.qb, ak.qe - ak.qb);
        if ((double)(e_min - b_max) >= (double)min_l * opt.mask_level) {
          if (ak.sub == 0) ak.sub = ai.score;
          if (ak.score - ai.score <= tmp && (ak.is_alt || !ai.is_alt))
            ++ak.sub_n;
          ai.secondary = (int32_t)kz;
          placed = true;
          break;
        }
      }
    }
    if (!placed) z.push_back((int)i);
  }
}

// mem_mark_primary_se (reference: src/bwamem.c:715-761). Reorders via the
// returned permutation; fills secondary/secondary_all/sub/alt_sc/sub_n.
std::vector<int> mark_primary(const Opt& opt, std::vector<Reg>& regs,
                              int64_t read_id) {
  const size_t n = regs.size();
  std::vector<int> ord(n);
  for (size_t i = 0; i < n; ++i) ord[i] = (int)i;
  if (n == 0) return ord;
  int n_pri = 0;
  for (size_t i = 0; i < n; ++i) {
    regs[i].sub = 0;
    regs[i].alt_sc = 0;
    regs[i].sub_n = 0;
    regs[i].secondary = -1;
    regs[i].secondary_all = -1;
    regs[i].hash = hash_64((uint64_t)(read_id + (int64_t)i));
    if (!regs[i].is_alt) ++n_pri;
  }
  // sort: score desc, is_alt asc, hash asc (reference alnreg_hlt)
  std::stable_sort(ord.begin(), ord.end(), [&](int x, int y) {
    const Reg &a = regs[x], &b = regs[y];
    if (a.score != b.score) return a.score > b.score;
    if (a.is_alt != b.is_alt) return !a.is_alt;
    return a.hash < b.hash;
  });
  mark_primary_core(opt, regs, ord, n);
  for (size_t i = 0; i < n; ++i) {
    Reg& p = regs[ord[i]];
    p.secondary_all = (int32_t)i;
    if (!p.is_alt && p.secondary >= 0 && regs[ord[p.secondary]].is_alt)
      p.alt_sc = regs[ord[p.secondary]].score;
  }
  if (n_pri >= 0 && (size_t)n_pri < n) {
    std::vector<int32_t> z(n, 0);
    std::vector<int> ord2 = ord;
    if (n_pri > 0) {
      // sort: is_alt asc, score desc, hash asc
      std::stable_sort(ord2.begin(), ord2.end(), [&](int x, int y) {
        const Reg &a = regs[x], &b = regs[y];
        if (a.is_alt != b.is_alt) return !a.is_alt;
        if (a.score != b.score) return a.score > b.score;
        return a.hash < b.hash;
      });
    }
    for (size_t i = 0; i < n; ++i) z[regs[ord2[i]].secondary_all] = (int32_t)i;
    for (size_t i = 0; i < n; ++i) {
      Reg& r = regs[ord2[i]];
      if (r.secondary >= 0) {
        r.secondary_all = z[r.secondary];
        if (r.is_alt) r.secondary = INT_MAX_SENTINEL;
      } else {
        r.secondary_all = -1;
      }
    }
    if (n_pri > 0) {
      for (int i = 0; i < n_pri; ++i) {
        regs[ord2[i]].sub = 0;
        regs[ord2[i]].secondary = -1;
      }
      mark_primary_core(opt, regs, ord2, (size_t)n_pri);
    }
    return ord2;
  }
  for (size_t i = 0; i < n; ++i)
    regs[ord[i]].secondary_all = regs[ord[i]].secondary;
  return ord;
}

// mem_approx_mapq_se (reference: src/bwamem.c:1690-1717)
int32_t approx_mapq(const Opt& opt, const Reg& a) {
  int32_t sub = a.sub ? a.sub : opt.min_seed_len * opt.a;
  sub = std::max(a.csub, sub);
  if (sub >= a.score) return 0;
  int32_t l = std::max(a.qe - a.qb, (int32_t)(a.re - a.rb));
  double identity =
      1.0 - (double)(l * opt.a - a.score) / (opt.a + opt.b) / l;
  int32_t mapq;
  if (a.score == 0) {
    mapq = 0;
  } else if (opt.mapQ_coef_len > 0) {
    double tmp =
        l < opt.mapQ_coef_len ? 1.0 : opt.mapQ_coef_fac / std::log((double)l);
    tmp *= identity * identity;
    mapq = (int32_t)(6.02 * (a.score - sub) / opt.a * tmp * tmp + 0.499);
  } else {
    mapq = (int32_t)(MEM_MAPQ_COEF * (1.0 - (double)sub / a.score) *
                         std::log((double)std::max(a.seedcov, 1)) +
                     0.499);
    if (identity < 0.95)
      mapq = (int32_t)(mapq * identity * identity + 0.499);
  }
  if (a.sub_n > 0)
    mapq -= (int32_t)(4.343 * std::log((double)a.sub_n + 1.0) + 0.499);
  if (mapq > 60) mapq = 60;
  if (mapq < 0) mapq = 0;
  mapq = (int32_t)(mapq * (1.0 - a.frac_rep) + 0.499);
  return mapq;
}

struct Aln {
  int32_t flag = 0;
  int32_t rid = -1;
  int64_t pos = -1;
  bool is_rev = false, is_alt = false;
  int32_t mapq = 0, NM = -1, score = 0, sub = -1, alt_sc = 0;
  std::vector<uint32_t> cigar;  // (len<<4 | op), ops 0..4 = MIDSH
  std::string md;
  std::string XA;
};

struct Out {
  char* buf;
  int64_t cap;
  int64_t len = 0;
  bool overflow = false;
  inline void put(const char* s, size_t n) {
    if (len + (int64_t)n > cap) {
      overflow = true;
      return;
    }
    std::memcpy(buf + len, s, n);
    len += (int64_t)n;
  }
  inline void putc(char c) {
    if (len + 1 > cap) {
      overflow = true;
      return;
    }
    buf[len++] = c;
  }
  inline void puts(const std::string& s) { put(s.data(), s.size()); }
  inline void puti(int64_t v) {
    char tmp[24];
    int n = std::snprintf(tmp, sizeof tmp, "%lld", (long long)v);
    put(tmp, (size_t)n);
  }
};

inline void append_cigar_str(std::string* s, const std::vector<uint32_t>& cig) {
  char tmp[16];
  for (uint32_t c : cig) {
    int n = std::snprintf(tmp, sizeof tmp, "%u%c", c >> 4,
                          CIGAR_CHARS[c & 0xF]);
    s->append(tmp, (size_t)n);
  }
}

// mem_reg2aln post: coordinates, D-squeeze, soft clips
// (reference: src/bwamem.c:2400-2438)
void reg2aln_post(const Reg& r, int32_t l_query, int64_t l_pac,
                  const int64_t* ann_off, int32_t n_ref, GenOut* g,
                  Aln* a) {
  a->NM = g->nm;
  a->md.swap(g->md);
  int64_t pos_d = r.rb < l_pac ? r.rb : r.re - 1;
  bool is_rev = pos_d >= l_pac;
  int64_t pos = is_rev ? ((l_pac << 1) - 1 - pos_d) : pos_d;
  a->is_rev = is_rev;
  std::vector<uint32_t>& cig = g->cig;
  size_t c0 = 0, c1 = cig.size();
  if (!cig.empty()) {
    if ((cig.front() & 0xF) == 2) {  // leading D
      pos += cig.front() >> 4;
      ++c0;
    } else if ((cig.back() & 0xF) == 2) {
      --c1;
    }
  }
  a->cigar.assign(cig.begin() + c0, cig.begin() + c1);
  if (r.qb != 0 || r.qe != l_query) {
    int32_t clip5 = is_rev ? l_query - r.qe : r.qb;
    int32_t clip3 = is_rev ? r.qb : l_query - r.qe;
    if (clip5)
      a->cigar.insert(a->cigar.begin(), (uint32_t)clip5 << 4 | 3);
    if (clip3) a->cigar.push_back((uint32_t)clip3 << 4 | 3);
  }
  // pos_to_rid (binary search over ann_off[0..n_ref])
  int lo = 0, hi = n_ref;
  while (hi - lo > 1) {
    int mid = (lo + hi) >> 1;
    if (ann_off[mid] <= pos)
      lo = mid;
    else
      hi = mid;
  }
  a->rid = lo;
  a->pos = pos - ann_off[lo];
  a->score = r.score;
  a->sub = std::max(r.sub, r.csub);
  a->is_alt = r.is_alt;
  a->alt_sc = r.alt_sc;
}

inline int32_t rlen_of(const std::vector<uint32_t>& cig) {
  int32_t n = 0;
  for (uint32_t c : cig) {
    int op = (int)(c & 0xF);
    if (op == 0 || op == 2) n += (int32_t)(c >> 4);
  }
  return n;
}

// mem_aln2sam for the SE case (reference: src/bwamem.c:1506-1688)
void aln2sam(const Opt& opt, const char* ref_names, const int64_t* rname_off,
             const char* annos, const int64_t* anno_off, const char* name,
             size_t name_len, const uint8_t* seq, int32_t l_seq,
             const char* qual, int32_t qual_len, const char* comment,
             int32_t comment_len, const char* rg, int32_t rg_len,
             const std::vector<Aln>& alns, size_t which, Out* o) {
  const Aln& p = alns[which];
  int32_t flag = p.flag;
  int32_t rid = p.rid;
  int64_t pos = p.pos;
  bool is_rev = p.is_rev;
  const std::vector<uint32_t>& cigar = p.cigar;
  if (rid < 0) flag |= 0x4;
  if (is_rev) flag |= 0x10;

  o->put(name, name_len);
  o->putc('\t');
  o->puti((flag & 0xFFFF) | ((flag & 0x10000) ? 0x100 : 0));
  o->putc('\t');
  if (rid >= 0) {
    o->put(ref_names + rname_off[rid],
           (size_t)(rname_off[rid + 1] - rname_off[rid]));
    o->putc('\t');
    o->puti(pos + 1);
    o->putc('\t');
    o->puti(p.mapq);
    o->putc('\t');
    if (!cigar.empty()) {
      char tmp[16];
      for (uint32_t c : cigar) {
        int op = (int)(c & 0xF);
        if (!opt.flag_softclip && !p.is_alt && (op == 3 || op == 4))
          op = which ? 4 : 3;
        int n = std::snprintf(tmp, sizeof tmp, "%u%c", c >> 4,
                              CIGAR_CHARS[op]);
        o->put(tmp, (size_t)n);
      }
    } else {
      o->putc('*');
    }
  } else {
    o->put("*\t0\t0\t*", 7);
  }
  o->put("\t*\t0\t0\t", 7);  // SE: no mate

  // SEQ / QUAL
  if (flag & 0x100) {
    o->put("*\t*", 3);
  } else {
    int32_t qb = 0, qe = l_seq;
    if (!cigar.empty() && which && !opt.flag_softclip && !p.is_alt) {
      int op0 = (int)(cigar.front() & 0xF);
      int opl = (int)(cigar.back() & 0xF);
      if (op0 == 3 || op0 == 4) {
        if (is_rev)
          qe -= (int32_t)(cigar.front() >> 4);
        else
          qb += (int32_t)(cigar.front() >> 4);
      }
      if (opl == 3 || opl == 4) {
        if (is_rev)
          qb += (int32_t)(cigar.back() >> 4);
        else
          qe -= (int32_t)(cigar.back() >> 4);
      }
    }
    if (qe <= qb) {
      o->putc('*');
    } else if (!is_rev) {
      for (int32_t i = qb; i < qe; ++i) o->putc(FWD_BASES[seq[i]]);
    } else {
      for (int32_t i = qe - 1; i >= qb; --i) o->putc(REV_BASES[seq[i]]);
    }
    o->putc('\t');
    if (qual_len > 0 && qe > qb) {
      if (!is_rev)
        o->put(qual + qb, (size_t)(qe - qb));
      else
        for (int32_t i = qe - 1; i >= qb; --i) o->putc(qual[i]);
    } else {
      o->putc('*');
    }
  }

  // tags
  char tmp[64];
  if (!cigar.empty()) {
    o->put("\tNM:i:", 6);
    o->puti(p.NM);
    o->put("\tMD:Z:", 6);
    o->puts(p.md);
  }
  if (p.score >= 0) {
    o->put("\tAS:i:", 6);
    o->puti(p.score);
  }
  if (p.sub >= 0) {
    o->put("\tXS:i:", 6);
    o->puti(p.sub);
  }
  if (rg_len > 0) {
    o->put("\tRG:Z:", 6);
    o->put(rg, (size_t)rg_len);
  }
  if (!(flag & 0x100)) {
    bool any_other = false;
    for (size_t i = 0; i < alns.size(); ++i)
      if (i != which && !(alns[i].flag & 0x100)) any_other = true;
    if (any_other) {
      o->put("\tSA:Z:", 6);
      for (size_t i = 0; i < alns.size(); ++i) {
        const Aln& r = alns[i];
        if (i == which || (r.flag & 0x100)) continue;
        o->put(ref_names + rname_off[r.rid],
               (size_t)(rname_off[r.rid + 1] - rname_off[r.rid]));
        o->putc(',');
        o->puti(r.pos + 1);
        o->putc(',');
        o->putc(r.is_rev ? '-' : '+');
        o->putc(',');
        for (uint32_t c : r.cigar) {
          int n = std::snprintf(tmp, sizeof tmp, "%u%c", c >> 4,
                                CIGAR_CHARS[c & 0xF]);
          o->put(tmp, (size_t)n);
        }
        o->putc(',');
        o->puti(r.mapq);
        o->putc(',');
        o->puti(r.NM);
        o->putc(';');
      }
    }
    if (p.alt_sc > 0) {
      int n = std::snprintf(tmp, sizeof tmp, "\tpa:f:%.3f",
                            (double)p.score / p.alt_sc);
      o->put(tmp, (size_t)n);
    }
  }
  if (!p.XA.empty()) {
    o->put("\tXA:Z:", 6);
    o->puts(p.XA);
  }
  if (opt.flag_ref_hdr && p.rid >= 0 && annos != nullptr) {
    int64_t ab = anno_off[p.rid], ae = anno_off[p.rid + 1];
    if (ae > ab) {
      o->put("\tXR:Z:", 6);
      for (int64_t i = ab; i < ae; ++i)
        o->putc(annos[i] == '\t' ? ' ' : annos[i]);
    }
  }
  if (comment_len > 0) {
    o->putc('\t');
    o->put(comment, (size_t)comment_len);
  }
  o->putc('\n');
}

}  // namespace

extern "C" int bm_finalize_se_batch(
    // index
    const uint32_t* pac, int64_t l_pac, const int8_t* mat,
    const int64_t* ann_off, int32_t n_ref, const char* ref_names,
    const int64_t* rname_off, const char* annos, const int64_t* anno_off,
    // options (see Opt)
    const double* opt_d, const int32_t* opt_i,
    // reads (B of them)
    int64_t n_reads, int64_t read_id0, const int64_t* reg_off,
    const uint8_t* qstream, const int64_t* q_off, const int32_t* q_len,
    const char* names, const int64_t* name_off, const char* quals,
    const int64_t* qual_off, const char* comments, const int64_t* com_off,
    const char* rg, int32_t rg_len,
    // regions (flat, grouped by read via reg_off)
    const int64_t* rb, const int64_t* re, const int32_t* qb,
    const int32_t* qe, const int32_t* score, const int32_t* truesc,
    const int32_t* sub, const int32_t* csub, const int32_t* arw,
    const int32_t* seedcov, const int32_t* rid, const int8_t* is_alt,
    const double* frac,
    // output
    char* out_buf, int64_t out_cap, int64_t* out_len) {
  Opt opt;
  opt.a = opt_i[0];
  opt.b = opt_i[1];
  opt.o_del = opt_i[2];
  opt.e_del = opt_i[3];
  opt.o_ins = opt_i[4];
  opt.e_ins = opt_i[5];
  opt.w = opt_i[6];
  opt.T = opt_i[7];
  opt.min_seed_len = opt_i[8];
  opt.max_XA_hits = opt_i[9];
  opt.max_XA_hits_alt = opt_i[10];
  opt.mapQ_coef_len = opt_i[11];
  opt.flag_softclip = opt_i[12];
  opt.flag_all = opt_i[13];
  opt.flag_no_multi = opt_i[14];
  opt.flag_ref_hdr = opt_i[15];
  opt.drop_ratio = opt_d[0];
  opt.XA_drop_ratio = opt_d[1];
  opt.mask_level = opt_d[2];
  opt.mapQ_coef_fac = opt_d[3];

  Out o{out_buf, out_cap};
  GenOut g;
  std::vector<Reg> regs;
  std::vector<Aln> alns;
  std::vector<std::string> xa;

  for (int64_t b = 0; b < n_reads; ++b) {
    const int64_t r0 = reg_off[b], r1 = reg_off[b + 1];
    const size_t n = (size_t)(r1 - r0);
    const uint8_t* seq = qstream + q_off[b];
    const int32_t lq = q_len[b];
    regs.clear();
    regs.reserve(n);
    for (int64_t k = r0; k < r1; ++k) {
      Reg r;
      r.rb = rb[k];
      r.re = re[k];
      r.qb = qb[k];
      r.qe = qe[k];
      r.score = score[k];
      r.truesc = truesc[k];
      r.sub = sub[k];
      r.csub = csub[k];
      r.w = arw[k];
      r.seedcov = seedcov[k];
      r.rid = rid[k];
      r.is_alt = is_alt[k] != 0;
      r.frac_rep = frac[k];
      regs.push_back(r);
    }
    std::vector<int> ord = mark_primary(opt, regs, read_id0 + b);

    // XA generation (mem_gen_alt) over the marked order
    xa.assign(n, std::string());
    if (!opt.flag_all && n > 0) {
      auto pri_idx = [&](size_t i) -> int32_t {
        const Reg& r = regs[ord[i]];
        int32_t k = r.secondary_all;
        if (k >= 0 &&
            (double)r.score >= regs[ord[k]].score * opt.XA_drop_ratio)
          return k;
        return -1;
      };
      std::vector<int32_t> cnt(n, 0);
      std::vector<char> has_alt(n, 0);
      int32_t tot = 0;
      for (size_t i = 0; i < n; ++i) {
        int32_t r = pri_idx(i);
        if (r >= 0) {
          ++cnt[r];
          ++tot;
          if (regs[ord[i]].is_alt) has_alt[r] = 1;
        }
      }
      if (tot) {
        char tmp[64];
        for (size_t i = 0; i < n; ++i) {
          int32_t r = pri_idx(i);
          if (r < 0) continue;
          if (cnt[r] > opt.max_XA_hits_alt ||
              (!has_alt[r] && cnt[r] > opt.max_XA_hits))
            continue;
          const Reg& rr = regs[ord[i]];
          solve_record(pac, l_pac, mat, opt.o_del, opt.e_del, opt.o_ins,
                       opt.e_ins, opt.a, opt.w, seq + rr.qb, rr.qe - rr.qb,
                       rr.rb, rr.re, rr.truesc, rr.w, &g);
          Aln t;
          reg2aln_post(rr, lq, l_pac, ann_off, n_ref, &g, &t);
          std::string& dst = xa[(size_t)r];
          dst.append(ref_names + rname_off[t.rid],
                     (size_t)(rname_off[t.rid + 1] - rname_off[t.rid]));
          dst.push_back(',');
          dst.push_back(t.is_rev ? '-' : '+');
          int nn = std::snprintf(tmp, sizeof tmp, "%lld,",
                                 (long long)(t.pos + 1));
          dst.append(tmp, (size_t)nn);
          append_cigar_str(&dst, t.cigar);
          nn = std::snprintf(tmp, sizeof tmp, ",%d;", t.NM);
          dst.append(tmp, (size_t)nn);
        }
      }
    }

    // selection (mem_reg2sam, reference: src/bwamem.c:1721-1775)
    alns.clear();
    for (size_t i = 0; i < n; ++i) {
      const Reg& p = regs[ord[i]];
      if (p.score < opt.T) continue;
      if (p.secondary >= 0 && (p.is_alt || !opt.flag_all)) continue;
      if (p.secondary >= 0 && p.secondary < INT_MAX_SENTINEL &&
          (double)p.score <
              regs[ord[p.secondary]].score * opt.drop_ratio)
        continue;
      Aln q;
      q.mapq = p.secondary < 0 ? approx_mapq(opt, p) : 0;
      if (p.secondary >= 0) q.flag |= 0x100;
      solve_record(pac, l_pac, mat, opt.o_del, opt.e_del, opt.o_ins,
                   opt.e_ins, opt.a, opt.w, seq + p.qb, p.qe - p.qb, p.rb,
                   p.re, p.truesc, p.w, &g);
      reg2aln_post(p, lq, l_pac, ann_off, n_ref, &g, &q);
      q.XA = xa[i];
      if (p.secondary >= 0) q.sub = -1;
      if (!alns.empty() && p.secondary < 0)
        q.flag |= opt.flag_no_multi ? 0x10000 : 0x800;
      if (!alns.empty() && !p.is_alt && q.mapq > alns[0].mapq)
        q.mapq = alns[0].mapq;
      alns.push_back(std::move(q));
    }
    if (alns.empty()) {
      Aln t;  // unmapped record (mem_reg2aln(None)): score 0, sub -1
      t.score = 0;
      t.sub = -1;
      alns.push_back(std::move(t));
    }
    const char* nm = names + name_off[b];
    size_t nm_len = (size_t)(name_off[b + 1] - name_off[b]);
    const char* ql = quals ? quals + qual_off[b] : nullptr;
    int32_t ql_len = quals ? (int32_t)(qual_off[b + 1] - qual_off[b]) : 0;
    const char* cm = comments ? comments + com_off[b] : nullptr;
    int32_t cm_len = comments ? (int32_t)(com_off[b + 1] - com_off[b]) : 0;
    for (size_t w = 0; w < alns.size(); ++w) {
      aln2sam(opt, ref_names, rname_off, annos, anno_off, nm, nm_len, seq,
              lq, ql, ql_len, cm, cm_len, rg, rg_len, alns, w, &o);
      if (o.overflow) return 1;
    }
  }
  *out_len = o.len;
  return 0;
}
