// Native finalization (single-end AND paired-end): mark-primary, record
// selection, pairing, XA generation, CIGAR/NM/MD solving and SAM text
// assembly in ONE call over a slice of reads/pairs — the array-native
// replacement for the per-record Python emit path.
//
// Reference semantics replicated bit-for-bit (each cited):
//   * mem_mark_primary_se (+_core)        src/bwamem.c:686-761
//   * mem_approx_mapq_se                  src/bwamem.c:1690-1717
//   * mem_reg2sam selection + flag rules  src/bwamem.c:1721-1775
//   * mem_gen_alt (XA:Z)                  src/bwamem_extra.c
//   * mem_reg2aln coordinates/clips       src/bwamem.c:2344-2438
//   * mem_aln2sam (fields, SA:Z, tags)    src/bwamem.c:1506-1688
//   * mem_pair / mem_sam_pe               src/bwamem_pair.c:190-397
// The Python twins live in pipeline/regions.py, pipeline/samgen.py and
// pipeline/pairing.py and anchor the differential tests.
//
// Output: one SAM text blob (every line '\n'-terminated; SE: reads in
// input order; PE: read1's lines then read2's lines per pair, pairs in
// input order). Returns 0 on success, 1 if the output buffer was too
// small (caller doubles and retries).

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
  int32_t min_seed_len;
  double drop_ratio, XA_drop_ratio, mask_level;
  int32_t max_XA_hits, max_XA_hits_alt;
  int32_t mapQ_coef_len;
  double mapQ_coef_fac;
  int32_t flag_softclip, flag_all, flag_no_multi, flag_ref_hdr;
  // PE extras
  int32_t pen_unpaired = 0, flag_nopairing = 0;
};

struct IdxRefs {
  const uint32_t* pac;
  int64_t l_pac;
  const int8_t* mat;
  const int64_t* ann_off;  // n_ref + 1 entries (last = total fwd length)
  int32_t n_ref;
  const char* ref_names;
  const int64_t* rname_off;
  const char* annos;
  const int64_t* anno_off;
};

struct ReadIn {
  const uint8_t* seq;
  int32_t lq;
  const char* name;
  size_t name_len;
  const char* qual;
  int32_t qual_len;
  const char* cm;
  int32_t cm_len;
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

// mem_mark_primary_se (reference: src/bwamem.c:715-761). Returns the
// permutation (marked order) and fills n_pri_out.
std::vector<int> mark_primary(const Opt& opt, std::vector<Reg>& regs,
                              int64_t read_id, int* n_pri_out) {
  const size_t n = regs.size();
  std::vector<int> ord(n);
  for (size_t i = 0; i < n; ++i) ord[i] = (int)i;
  *n_pri_out = 0;
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
  *n_pri_out = n_pri;
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
  if ((size_t)n_pri < n) {
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
void reg2aln_post(const Reg& r, int32_t l_query, const IdxRefs& ix,
                  GenOut* g, Aln* a) {
  a->NM = g->nm;
  a->md.swap(g->md);
  int64_t pos_d = r.rb < ix.l_pac ? r.rb : r.re - 1;
  bool is_rev = pos_d >= ix.l_pac;
  int64_t pos = is_rev ? ((ix.l_pac << 1) - 1 - pos_d) : pos_d;
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
  int lo = 0, hi = ix.n_ref;
  while (hi - lo > 1) {
    int mid = (lo + hi) >> 1;
    if (ix.ann_off[mid] <= pos)
      lo = mid;
    else
      hi = mid;
  }
  a->rid = lo;
  a->pos = pos - ix.ann_off[lo];
  a->score = r.score;
  a->sub = std::max(r.sub, r.csub);
  a->is_alt = r.is_alt;
  a->alt_sc = r.alt_sc;
}

inline void solve_into(const Opt& opt, const IdxRefs& ix, const ReadIn& rd,
                       const Reg& r, GenOut* g, Aln* a) {
  solve_record(ix.pac, ix.l_pac, ix.mat, opt.o_del, opt.e_del, opt.o_ins,
               opt.e_ins, opt.a, opt.w, rd.seq + r.qb, r.qe - r.qb, r.rb,
               r.re, r.truesc, r.w, g);
  reg2aln_post(r, rd.lq, ix, g, a);
}

inline int32_t rlen_of(const std::vector<uint32_t>& cig) {
  int32_t n = 0;
  for (uint32_t c : cig) {
    int op = (int)(c & 0xF);
    if (op == 0 || op == 2) n += (int32_t)(c >> 4);
  }
  return n;
}

// mem_aln2sam (reference: src/bwamem.c:1506-1688); mate == nullptr for SE
void aln2sam(const Opt& opt, const IdxRefs& ix, const ReadIn& rd,
             const char* rg, int32_t rg_len, const std::vector<Aln>& alns,
             size_t which, const Aln* mate, Out* o) {
  const Aln& p = alns[which];
  int32_t flag = p.flag;
  int32_t rid = p.rid;
  int64_t pos = p.pos;
  bool is_rev = p.is_rev;
  const std::vector<uint32_t>* cigar = &p.cigar;
  static const std::vector<uint32_t> kEmptyCigar;
  if (mate) {
    flag |= 0x1;
    if (mate->rid < 0) flag |= 0x8;
  }
  if (rid < 0) {
    flag |= 0x4;
    if (mate && mate->rid >= 0) {  // copy mate coordinates
      rid = mate->rid;
      pos = mate->pos;
      is_rev = mate->is_rev;
      cigar = &kEmptyCigar;
    }
  }
  int32_t mrid = mate ? mate->rid : -1;
  int64_t mpos = mate ? mate->pos : -1;
  bool mis_rev = mate ? mate->is_rev : false;
  const std::vector<uint32_t>* mcigar = mate ? &mate->cigar : &kEmptyCigar;
  if (mate && mate->rid < 0 && rid >= 0) {
    mrid = rid;
    mpos = pos;
    mis_rev = is_rev;
    mcigar = &kEmptyCigar;
  }
  if (is_rev) flag |= 0x10;
  if (mate && mis_rev) flag |= 0x20;

  o->put(rd.name, rd.name_len);
  o->putc('\t');
  o->puti((flag & 0xFFFF) | ((flag & 0x10000) ? 0x100 : 0));
  o->putc('\t');
  if (rid >= 0) {
    o->put(ix.ref_names + ix.rname_off[rid],
           (size_t)(ix.rname_off[rid + 1] - ix.rname_off[rid]));
    o->putc('\t');
    o->puti(pos + 1);
    o->putc('\t');
    o->puti(p.mapq);
    o->putc('\t');
    if (!cigar->empty()) {
      char tmp[16];
      for (uint32_t c : *cigar) {
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

  // mate position block
  if (mate && mrid >= 0) {
    o->putc('\t');
    if (rid == mrid)
      o->putc('=');
    else
      o->put(ix.ref_names + ix.rname_off[mrid],
             (size_t)(ix.rname_off[mrid + 1] - ix.rname_off[mrid]));
    o->putc('\t');
    o->puti(mpos + 1);
    o->putc('\t');
    int64_t tlen = 0;
    if (rid == mrid && !mcigar->empty() && !cigar->empty()) {
      int64_t p0 = pos + (is_rev ? rlen_of(*cigar) - 1 : 0);
      int64_t p1 = mpos + (mis_rev ? rlen_of(*mcigar) - 1 : 0);
      tlen = -(p0 - p1 + (p0 > p1 ? 1 : p0 < p1 ? -1 : 0));
    }
    o->puti(tlen);
    o->putc('\t');
  } else {
    o->put("\t*\t0\t0\t", 7);
  }

  // SEQ / QUAL — NOTE: orientation and clip bounds use the LOCAL
  // (possibly mate-copied) is_rev/cigar, matching mem_aln2sam's local
  // variables after the unmapped-copy block
  if (flag & 0x100) {
    o->put("*\t*", 3);
  } else {
    int32_t qb = 0, qe = rd.lq;
    if (!cigar->empty() && which && !opt.flag_softclip && !p.is_alt) {
      int op0 = (int)(cigar->front() & 0xF);
      int opl = (int)(cigar->back() & 0xF);
      if (op0 == 3 || op0 == 4) {
        if (is_rev)
          qe -= (int32_t)(cigar->front() >> 4);
        else
          qb += (int32_t)(cigar->front() >> 4);
      }
      if (opl == 3 || opl == 4) {
        if (is_rev)
          qb += (int32_t)(cigar->back() >> 4);
        else
          qe -= (int32_t)(cigar->back() >> 4);
      }
    }
    if (qe <= qb) {
      o->putc('*');
    } else if (!is_rev) {
      for (int32_t i = qb; i < qe; ++i) o->putc(FWD_BASES[rd.seq[i]]);
    } else {
      for (int32_t i = qe - 1; i >= qb; --i) o->putc(REV_BASES[rd.seq[i]]);
    }
    o->putc('\t');
    if (rd.qual_len > 0 && qe > qb) {
      if (!is_rev)
        o->put(rd.qual + qb, (size_t)(qe - qb));
      else
        for (int32_t i = qe - 1; i >= qb; --i) o->putc(rd.qual[i]);
    } else {
      o->putc('*');
    }
  }

  // tags
  char tmp[64];
  if (!cigar->empty()) {
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
        o->put(ix.ref_names + ix.rname_off[r.rid],
               (size_t)(ix.rname_off[r.rid + 1] - ix.rname_off[r.rid]));
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
  if (opt.flag_ref_hdr && p.rid >= 0 && ix.annos != nullptr) {
    int64_t ab = ix.anno_off[p.rid], ae = ix.anno_off[p.rid + 1];
    if (ae > ab) {
      o->put("\tXR:Z:", 6);
      for (int64_t i = ab; i < ae; ++i)
        o->putc(ix.annos[i] == '\t' ? ' ' : ix.annos[i]);
    }
  }
  if (rd.cm_len > 0) {
    o->putc('\t');
    o->put(rd.cm, (size_t)rd.cm_len);
  }
  o->putc('\n');
}

// mem_gen_alt XA strings over the marked order (reference:
// src/bwamem_extra.c; selection mirror of pipeline/samgen.mem_gen_alt)
void gen_xa(const Opt& opt, const IdxRefs& ix, const ReadIn& rd,
            std::vector<Reg>& regs, const std::vector<int>& ord,
            GenOut* g, std::vector<std::string>* xa) {
  const size_t n = regs.size();
  xa->assign(n, std::string());
  if (opt.flag_all || n == 0) return;
  auto pri_idx = [&](size_t i) -> int32_t {
    const Reg& r = regs[ord[i]];
    int32_t k = r.secondary_all;
    if (k >= 0 && (double)r.score >= regs[ord[k]].score * opt.XA_drop_ratio)
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
  if (!tot) return;
  char tmp[64];
  for (size_t i = 0; i < n; ++i) {
    int32_t r = pri_idx(i);
    if (r < 0) continue;
    if (cnt[r] > opt.max_XA_hits_alt ||
        (!has_alt[r] && cnt[r] > opt.max_XA_hits))
      continue;
    const Reg& rr = regs[ord[i]];
    Aln t;
    solve_into(opt, ix, rd, rr, g, &t);
    std::string& dst = (*xa)[(size_t)r];
    dst.append(ix.ref_names + ix.rname_off[t.rid],
               (size_t)(ix.rname_off[t.rid + 1] - ix.rname_off[t.rid]));
    dst.push_back(',');
    dst.push_back(t.is_rev ? '-' : '+');
    int nn = std::snprintf(tmp, sizeof tmp, "%lld,", (long long)(t.pos + 1));
    dst.append(tmp, (size_t)nn);
    append_cigar_str(&dst, t.cigar);
    nn = std::snprintf(tmp, sizeof tmp, ",%d;", t.NM);
    dst.append(tmp, (size_t)nn);
  }
}

// mem_reg2sam: selection + emit for one read (reference:
// src/bwamem.c:1721-1775). regs must be marked; ord = marked order.
void reg2sam_emit(const Opt& opt, const IdxRefs& ix, const ReadIn& rd,
                  const char* rg, int32_t rg_len, std::vector<Reg>& regs,
                  const std::vector<int>& ord, int32_t extra_flag,
                  const Aln* mate, GenOut* g, Out* o) {
  const size_t n = regs.size();
  std::vector<std::string> xa;
  gen_xa(opt, ix, rd, regs, ord, g, &xa);
  std::vector<Aln> alns;
  for (size_t i = 0; i < n; ++i) {
    const Reg& p = regs[ord[i]];
    if (p.score < opt.T) continue;
    if (p.secondary >= 0 && (p.is_alt || !opt.flag_all)) continue;
    if (p.secondary >= 0 && p.secondary < INT_MAX_SENTINEL &&
        (double)p.score < regs[ord[p.secondary]].score * opt.drop_ratio)
      continue;
    Aln q;
    q.mapq = p.secondary < 0 ? approx_mapq(opt, p) : 0;
    if (p.secondary >= 0) q.flag |= 0x100;
    solve_into(opt, ix, rd, p, g, &q);
    q.XA = xa.empty() ? std::string() : xa[i];
    q.flag |= extra_flag;
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
    t.flag |= extra_flag;
    alns.push_back(std::move(t));
  }
  for (size_t w = 0; w < alns.size(); ++w)
    aln2sam(opt, ix, rd, rg, rg_len, alns, w, mate, o);
}

void load_opt(const double* opt_d, const int32_t* opt_i, Opt* opt) {
  opt->a = opt_i[0];
  opt->b = opt_i[1];
  opt->o_del = opt_i[2];
  opt->e_del = opt_i[3];
  opt->o_ins = opt_i[4];
  opt->e_ins = opt_i[5];
  opt->w = opt_i[6];
  opt->T = opt_i[7];
  opt->min_seed_len = opt_i[8];
  opt->max_XA_hits = opt_i[9];
  opt->max_XA_hits_alt = opt_i[10];
  opt->mapQ_coef_len = opt_i[11];
  opt->flag_softclip = opt_i[12];
  opt->flag_all = opt_i[13];
  opt->flag_no_multi = opt_i[14];
  opt->flag_ref_hdr = opt_i[15];
  opt->pen_unpaired = opt_i[16];
  opt->flag_nopairing = opt_i[17];
  opt->drop_ratio = opt_d[0];
  opt->XA_drop_ratio = opt_d[1];
  opt->mask_level = opt_d[2];
  opt->mapQ_coef_fac = opt_d[3];
}

struct RegArrays {
  const int64_t* rb;
  const int64_t* re;
  const int32_t* qb;
  const int32_t* qe;
  const int32_t* score;
  const int32_t* truesc;
  const int32_t* sub;
  const int32_t* csub;
  const int32_t* arw;
  const int32_t* seedcov;
  const int32_t* rid;
  const int8_t* is_alt;
  const double* frac;
};

void load_regs(const RegArrays& ra, int64_t r0, int64_t r1,
               std::vector<Reg>* regs) {
  regs->clear();
  regs->reserve((size_t)(r1 - r0));
  for (int64_t k = r0; k < r1; ++k) {
    Reg r;
    r.rb = ra.rb[k];
    r.re = ra.re[k];
    r.qb = ra.qb[k];
    r.qe = ra.qe[k];
    r.score = ra.score[k];
    r.truesc = ra.truesc[k];
    r.sub = ra.sub[k];
    r.csub = ra.csub[k];
    r.w = ra.arw[k];
    r.seedcov = ra.seedcov[k];
    r.rid = ra.rid[k];
    r.is_alt = ra.is_alt[k] != 0;
    r.frac_rep = ra.frac[k];
    regs->push_back(r);
  }
}

inline ReadIn load_read(int64_t b, const uint8_t* qstream,
                        const int64_t* q_off, const int32_t* q_len,
                        const char* names, const int64_t* name_off,
                        const char* quals, const int64_t* qual_off,
                        const char* comments, const int64_t* com_off) {
  ReadIn rd;
  rd.seq = qstream + q_off[b];
  rd.lq = q_len[b];
  rd.name = names + name_off[b];
  rd.name_len = (size_t)(name_off[b + 1] - name_off[b]);
  rd.qual = quals ? quals + qual_off[b] : nullptr;
  rd.qual_len = quals ? (int32_t)(qual_off[b + 1] - qual_off[b]) : 0;
  rd.cm = comments ? comments + com_off[b] : nullptr;
  rd.cm_len = comments ? (int32_t)(com_off[b + 1] - com_off[b]) : 0;
  return rd;
}

// ------------------------------------------------------------- pairing --

struct PES {
  int32_t failed, low, high;
  double avg, std;
};

// mem_pair (reference: src/bwamem_pair.c:190-251)
void mem_pair(const Opt& opt, const IdxRefs& ix, const PES* pes,
              std::vector<Reg>* regs2, std::vector<int>* ord2,
              const int* n_pri, int64_t id_, int32_t* o_out,
              int32_t* sub_out, int32_t* n_sub_out, int z_out[2]) {
  std::vector<std::pair<uint64_t, uint64_t>> v;
  for (int r = 0; r < 2; ++r) {
    for (int i = 0; i < n_pri[r]; ++i) {
      const Reg& e = regs2[r][ord2[r][(size_t)i]];
      int64_t x = e.rb < ix.l_pac ? e.rb : (ix.l_pac << 1) - 1 - e.rb;
      // pos_to_rid of the forward coordinate
      int lo = 0, hi = ix.n_ref;
      while (hi - lo > 1) {
        int mid = (lo + hi) >> 1;
        if (ix.ann_off[mid] <= x)
          lo = mid;
        else
          hi = mid;
      }
      uint64_t xk = ((uint64_t)e.rid << 32) | (uint64_t)(x - ix.ann_off[lo]);
      uint64_t yk = ((uint64_t)(uint32_t)e.score << 32) |
                    ((uint64_t)i << 2) |
                    ((uint64_t)(e.rb >= ix.l_pac) << 1) | (uint64_t)r;
      v.emplace_back(xk, yk);
    }
  }
  std::sort(v.begin(), v.end());
  int64_t y_last[4] = {-1, -1, -1, -1};
  std::vector<std::pair<uint64_t, uint64_t>> u;
  for (size_t i = 0; i < v.size(); ++i) {
    for (int r = 0; r < 2; ++r) {
      int dr = (r << 1) | (int)((v[i].second >> 1) & 1);
      if (pes[dr].failed) continue;
      int which = (r << 1) | ((int)(v[i].second & 1) ^ 1);
      if (y_last[which] < 0) continue;
      for (int64_t k = y_last[which]; k >= 0; --k) {
        if ((int)(v[(size_t)k].second & 3) != which) continue;
        int64_t dist = (int64_t)v[i].first - (int64_t)v[(size_t)k].first;
        if (dist > pes[dr].high) break;
        if (dist < pes[dr].low) continue;
        double ns = ((double)dist - pes[dr].avg) /
                    std::max(pes[dr].std, 1e-6);
        double prior = 2.0 * std::erfc(
            std::min(std::fabs(ns) * 0.7071067811865476, 30.0));
        int64_t q;
        if (prior > 0.0) {
          q = (int64_t)((double)(v[i].second >> 32) +
                        (double)(v[(size_t)k].second >> 32) +
                        0.721 * std::log(prior) * opt.a + 0.499);
        } else {
          q = 0;
        }
        if (q < 0) q = 0;
        uint64_t yp = (((uint64_t)k << 32) | (uint64_t)i);
        uint64_t xp = ((uint64_t)q << 32) |
                      (hash_64(yp ^ ((uint64_t)id_ << 8)) & 0xFFFFFFFFull);
        u.emplace_back(xp, yp);
      }
    }
    y_last[v[i].second & 3] = (int64_t)i;
  }
  if (u.empty()) {
    *o_out = 0;
    *sub_out = 0;
    *n_sub_out = 0;
    z_out[0] = z_out[1] = 0;
    return;
  }
  const int32_t tmp = std::max(opt.a + opt.b,
                               std::max(opt.o_del + opt.e_del,
                                        opt.o_ins + opt.e_ins));
  std::sort(u.begin(), u.end());
  uint64_t bi = u.back().second >> 32;
  uint64_t bk = u.back().second & 0xFFFFFFFFull;
  z_out[v[(size_t)bi].second & 1] =
      (int)((v[(size_t)bi].second >> 2) & 0x3FFFFFFF);
  z_out[v[(size_t)bk].second & 1] =
      (int)((v[(size_t)bk].second >> 2) & 0x3FFFFFFF);
  *o_out = (int32_t)(u.back().first >> 32);
  *sub_out = u.size() > 1 ? (int32_t)(u[u.size() - 2].first >> 32) : 0;
  int n_sub = 0;
  for (size_t x = 0; x + 1 < u.size(); ++x)
    if (*sub_out - (int32_t)(u[x].first >> 32) <= tmp) ++n_sub;
  *n_sub_out = n_sub;
}

inline int32_t raw_mapq(int32_t diff, int32_t a) {
  return (int32_t)(6.02 * diff / a + 0.499);
}

// mem_infer_dir (reference: src/bwamem_pair.c:23-30)
inline void infer_dir(int64_t l_pac, int64_t b1, int64_t b2, int* d,
                      int64_t* dist) {
  bool r1 = b1 >= l_pac, r2 = b2 >= l_pac;
  int64_t p2 = (r1 == r2) ? b2 : (l_pac << 1) - 1 - b2;
  *dist = p2 > b1 ? p2 - b1 : b1 - p2;
  *d = ((r1 == r2) ? 0 : 1) ^ ((p2 > b1) ? 0 : 3);
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
  int32_t opt_i_pe[18];
  std::memcpy(opt_i_pe, opt_i, 16 * sizeof(int32_t));
  opt_i_pe[16] = opt_i_pe[17] = 0;
  load_opt(opt_d, opt_i_pe, &opt);
  IdxRefs ix{pac, l_pac, mat, ann_off, n_ref, ref_names, rname_off,
             annos, anno_off};
  RegArrays ra{rb, re, qb, qe, score, truesc, sub, csub, arw, seedcov,
               rid, is_alt, frac};

  Out o{out_buf, out_cap};
  GenOut g;
  std::vector<Reg> regs;

  for (int64_t b = 0; b < n_reads; ++b) {
    load_regs(ra, reg_off[b], reg_off[b + 1], &regs);
    int n_pri = 0;
    std::vector<int> ord = mark_primary(opt, regs, read_id0 + b, &n_pri);
    ReadIn rd = load_read(b, qstream, q_off, q_len, names, name_off,
                          quals, qual_off, comments, com_off);
    reg2sam_emit(opt, ix, rd, rg, rg_len, regs, ord, 0, nullptr, &g, &o);
    if (o.overflow) return 1;
  }
  *out_len = o.len;
  return 0;
}

extern "C" int bm_finalize_pe_batch(
    // index
    const uint32_t* pac, int64_t l_pac, const int8_t* mat,
    const int64_t* ann_off, int32_t n_ref, const char* ref_names,
    const int64_t* rname_off, const char* annos, const int64_t* anno_off,
    // options (Opt incl. pen_unpaired + nopairing at i16/i17)
    const double* opt_d, const int32_t* opt_i,
    // insert-size model: 4 orientations x (failed, low, high) + (avg, std)
    const int32_t* pes_i, const double* pes_d,
    // reads (2 * n_pairs, interleaved r1 r2)
    int64_t n_pairs, int64_t pair_id0, const int64_t* reg_off,
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
  load_opt(opt_d, opt_i, &opt);
  IdxRefs ix{pac, l_pac, mat, ann_off, n_ref, ref_names, rname_off,
             annos, anno_off};
  RegArrays ra{rb, re, qb, qe, score, truesc, sub, csub, arw, seedcov,
               rid, is_alt, frac};
  PES pes[4];
  for (int d = 0; d < 4; ++d) {
    pes[d].failed = pes_i[d * 3];
    pes[d].low = pes_i[d * 3 + 1];
    pes[d].high = pes_i[d * 3 + 2];
    pes[d].avg = pes_d[d * 2];
    pes[d].std = pes_d[d * 2 + 1];
  }

  Out o{out_buf, out_cap};
  GenOut g;
  std::vector<Reg> regs2[2];
  std::vector<int> ord2[2];

  for (int64_t pi = 0; pi < n_pairs; ++pi) {
    const int64_t id_ = pair_id0 + pi;
    int n_pri[2] = {0, 0};
    ReadIn rd[2];
    for (int i = 0; i < 2; ++i) {
      int64_t b = (pi << 1) | i;
      load_regs(ra, reg_off[b], reg_off[b + 1], &regs2[i]);
      ord2[i] = mark_primary(opt, regs2[i], (id_ << 1) | i, &n_pri[i]);
      rd[i] = load_read(b, qstream, q_off, q_len, names, name_off, quals,
                        qual_off, comments, com_off);
    }
    auto marked = [&](int i, int j) -> Reg& {
      return regs2[i][ord2[i][(size_t)j]];
    };

    // decide pair vs nopair (mem_sam_pe_plan logic)
    bool nopair = opt.flag_nopairing || !(n_pri[0] && n_pri[1]);
    int32_t o_sc = 0, subo = 0, n_sub = 0;
    int z[2] = {0, 0};
    if (!nopair) {
      mem_pair(opt, ix, pes, regs2, ord2, n_pri, id_, &o_sc, &subo,
               &n_sub, z);
      if (o_sc <= 0) nopair = true;
    }
    if (!nopair) {
      for (int i = 0; i < 2 && !nopair; ++i)
        for (int j = 1; j < n_pri[i]; ++j)
          if (marked(i, j).secondary < 0 && marked(i, j).score >= opt.T) {
            nopair = true;
            break;
          }
    }

    if (nopair) {
      // representative single-end alignments used as each other's mates
      Aln h[2];
      for (int i = 0; i < 2; ++i) {
        int which = -1;
        const size_t n = regs2[i].size();
        if (n) {
          if (marked(i, 0).score >= opt.T)
            which = 0;
          else if ((size_t)n_pri[i] < n &&
                   marked(i, n_pri[i]).score >= opt.T)
            which = n_pri[i];
        }
        if (which >= 0) {
          const Reg& p = marked(i, which);
          h[i].mapq = p.secondary < 0 ? approx_mapq(opt, p) : 0;
          if (p.secondary >= 0) h[i].flag |= 0x100;
          solve_into(opt, ix, rd[i], p, &g, &h[i]);
        } else {
          h[i].score = 0;
          h[i].sub = -1;
        }
      }
      int32_t extra_flag = 1;
      if (!opt.flag_nopairing && h[0].rid == h[1].rid && h[0].rid >= 0 &&
          !regs2[0].empty() && !regs2[1].empty()) {
        int d;
        int64_t dist;
        infer_dir(l_pac, marked(0, 0).rb, marked(1, 0).rb, &d, &dist);
        if (!pes[d].failed && pes[d].low <= dist && dist <= pes[d].high)
          extra_flag |= 2;
      }
      reg2sam_emit(opt, ix, rd[0], rg, rg_len, regs2[0], ord2[0],
                   0x41 | extra_flag, &h[1], &g, &o);
      reg2sam_emit(opt, ix, rd[1], rg, rg_len, regs2[1], ord2[1],
                   0x81 | extra_flag, &h[0], &g, &o);
      if (o.overflow) return 1;
      continue;
    }

    // paired mode (reference: src/bwamem_pair.c:300-397)
    int32_t extra_flag = 1;
    int32_t score_un =
        marked(0, 0).score + marked(1, 0).score - opt.pen_unpaired;
    if (score_un > subo) subo = score_un;
    int32_t q_pe = raw_mapq(o_sc - subo, opt.a);
    if (n_sub > 0)
      q_pe -= (int32_t)(4.343 * std::log((double)n_sub + 1.0) + 0.499);
    if (q_pe < 0) q_pe = 0;
    if (q_pe > 60) q_pe = 60;
    q_pe = (int32_t)(q_pe * (1.0 - 0.5 * (marked(0, 0).frac_rep +
                                          marked(1, 0).frac_rep)) +
                     0.499);
    int32_t q_se[2] = {0, 0};
    if (o_sc > score_un) {  // paired alignment preferred
      for (int i = 0; i < 2; ++i) {
        Reg& c = marked(i, z[i]);
        if (c.secondary >= 0) {
          c.sub = marked(i, c.secondary).score;
          c.secondary = -2;
        }
        q_se[i] = approx_mapq(opt, c);
      }
      for (int i = 0; i < 2; ++i) {
        const Reg& c = marked(i, z[i]);
        if (q_se[i] <= q_pe)
          q_se[i] = q_pe < q_se[i] + 40 ? q_pe : q_se[i] + 40;
        q_se[i] = std::min(q_se[i], raw_mapq(c.score - c.csub, opt.a));
      }
      extra_flag |= 2;
    } else {  // unpaired preferred
      z[0] = z[1] = 0;
      q_se[0] = approx_mapq(opt, marked(0, 0));
      q_se[1] = approx_mapq(opt, marked(1, 0));
    }
    // promote the chosen hit to primary if it was a secondary of a
    // non-ALT (reference: the secondary_all rewrite in mem_sam_pe)
    for (int i = 0; i < 2; ++i) {
      int32_t k = marked(i, z[i]).secondary_all;
      if (k >= 0 && k < n_pri[i]) {
        for (size_t jj = 0; jj < regs2[i].size(); ++jj) {
          Reg& rj = regs2[i][ord2[i][jj]];
          if (rj.secondary_all == k || (int32_t)jj == k)
            rj.secondary_all = z[i];
        }
        marked(i, z[i]).secondary_all = -1;
      }
    }
    // XA strings (marked order)
    std::vector<std::string> xa[2];
    for (int i = 0; i < 2; ++i)
      gen_xa(opt, ix, rd[i], regs2[i], ord2[i], &g, &xa[i]);

    Aln h[2];
    std::vector<Aln> aa[2];
    for (int i = 0; i < 2; ++i) {
      const Reg& c = marked(i, z[i]);
      h[i].mapq = 0;  // overwritten below
      if (c.secondary >= 0) h[i].flag |= 0x100;
      solve_into(opt, ix, rd[i], c, &g, &h[i]);
      h[i].mapq = q_se[i];
      h[i].flag |= (0x40 << i) | extra_flag;
      if (!xa[i].empty()) h[i].XA = xa[i][(size_t)z[i]];
    }
    for (int i = 0; i < 2; ++i) {
      aa[i].push_back(h[i]);
      const size_t n = regs2[i].size();
      if ((size_t)n_pri[i] < n) {
        const Reg& pr = marked(i, n_pri[i]);
        if (pr.score >= opt.T && pr.secondary < 0 && pr.is_alt) {
          Aln gg;
          gg.mapq = pr.secondary < 0 ? approx_mapq(opt, pr) : 0;
          solve_into(opt, ix, rd[i], pr, &g, &gg);
          gg.flag |= 0x800 | (0x40 << i) | extra_flag;
          if (!xa[i].empty()) gg.XA = xa[i][(size_t)n_pri[i]];
          aa[i].push_back(std::move(gg));
        }
      }
    }
    for (int i = 0; i < 2; ++i) {
      for (size_t w = 0; w < aa[i].size(); ++w)
        aln2sam(opt, ix, rd[i], rg, rg_len, aa[i], w, &aa[1 - i][0], &o);
      if (o.overflow) return 1;
    }
  }
  *out_len = o.len;
  return 0;
}
