// Seed chaining + chain filtering, written from scratch for the
// bwamem_tpu host runtime.
//
// Role in the framework: the host half of the aligner core's chain stage
// (reference: src/bwamem.c:404-477 mem_chain with its kbtree
// nearest-chain insertion, :337-359 test_and_merge, :361-384
// mem_chain_weight, :488-559 mem_chain_flt). Semantics mirror the Python
// implementation in pipeline/chain.py (which is the tested
// reference-parity port); either backend can be swapped in and a
// differential test keeps them identical. Being GIL-free C++, this stage
// also scales across the host pool's processes/threads.
//
// Interface (ctypes): one call chains a whole read batch. Seeds arrive as
// flat arrays sorted by read with per-read [bounds[i], bounds[i+1])
// ranges, in device-seeding output order (SMEM groups = consecutive
// entries sharing (qbeg, qend)). Outputs are flat kept-chain seed arrays
// plus a chain table; chains of each read are emitted in
// weight-descending kept order (the order mem_chain_flt returns).

#include <algorithm>
#include <cstdint>
#include <vector>

namespace {

struct Seed {
  int64_t rbeg;
  int32_t qbeg;
  int32_t len;
};

struct Chain {
  int64_t pos;
  int32_t rid;
  int32_t w = 0;
  int32_t kept = 0;
  int32_t first = -1;
  std::vector<Seed> seeds;
};

int32_t pos2rid(const int64_t* ann_off, int64_t n_ann, int64_t total,
                int64_t pos) {
  if (pos < 0 || pos >= total) return -1;
  int64_t lo = 0, hi = n_ann;
  while (hi - lo > 1) {
    int64_t mid = (lo + hi) >> 1;
    if (ann_off[mid] <= pos)
      lo = mid;
    else
      hi = mid;
  }
  return (int32_t)lo;
}

int32_t intv2rid(const int64_t* ann_off, int64_t n_ann, int64_t l_pac,
                 int64_t rb, int64_t re) {
  if (rb < l_pac && l_pac < re) return -2;
  auto depos = [&](int64_t p) {
    return p >= l_pac ? (l_pac << 1) - 1 - p : p;
  };
  int32_t rid_b = pos2rid(ann_off, n_ann, l_pac, depos(rb));
  int32_t rid_e =
      rb < re ? pos2rid(ann_off, n_ann, l_pac, depos(re - 1)) : rid_b;
  return rid_b == rid_e ? rid_b : -1;
}

// reference: src/bwamem.c:337-359 test_and_merge
bool test_and_merge(int32_t w, int32_t max_chain_gap, int64_t l_pac,
                    Chain& c, const Seed& s, int32_t rid) {
  const Seed& last = c.seeds.back();
  const Seed& first = c.seeds.front();
  int64_t qend = (int64_t)last.qbeg + last.len;
  int64_t rend = last.rbeg + last.len;
  if (rid != c.rid) return false;
  if (s.qbeg >= first.qbeg && s.qbeg + s.len <= qend &&
      s.rbeg >= first.rbeg && s.rbeg + s.len <= rend)
    return true;  // contained
  if ((last.rbeg < l_pac || first.rbeg < l_pac) && s.rbeg >= l_pac)
    return false;  // different strand
  int64_t x = s.qbeg - last.qbeg;
  int64_t y = s.rbeg - last.rbeg;
  if (y >= 0 && x - y <= w && y - x <= w && x - last.len < max_chain_gap &&
      y - last.len < max_chain_gap) {
    c.seeds.push_back(s);
    return true;
  }
  return false;
}

// reference: src/bwamem.c:361-384 mem_chain_weight
int32_t chain_weight(const Chain& c) {
  int64_t w = 0, end = 0;
  for (const Seed& s : c.seeds) {
    if (s.qbeg >= end)
      w += s.len;
    else if (s.qbeg + s.len > end)
      w += s.qbeg + s.len - end;
    end = std::max<int64_t>(end, (int64_t)s.qbeg + s.len);
  }
  int64_t tmp = w;
  w = 0;
  end = 0;
  for (const Seed& s : c.seeds) {
    if (s.rbeg >= end)
      w += s.len;
    else if (s.rbeg + s.len > end)
      w += s.rbeg + s.len - end;
    end = std::max<int64_t>(end, s.rbeg + s.len);
  }
  w = std::min(w, tmp);
  return (int32_t)std::min<int64_t>(w, (1 << 30) - 1);
}

}  // namespace

extern "C" int64_t bm_chain_batch(
    const int32_t* s_qbeg, const int32_t* s_qend, const int64_t* s_rbeg,
    const int64_t* s_nocc, const int64_t* bounds, int64_t n_reads,
    const int32_t* l_query, const int64_t* ann_off,
    const int8_t* ann_alt /* per-rid ALT flags, may be null */,
    int64_t n_ann, int64_t l_pac, int32_t w, int32_t max_chain_gap, int32_t max_occ,
    int32_t min_seed_len, double mask_level, double drop_ratio,
    int32_t min_chain_weight, int64_t max_chain_extend,
    int64_t* o_seed_rbeg, int32_t* o_seed_qbeg, int32_t* o_seed_len,
    int64_t o_seed_cap, int32_t* o_chain_read, int32_t* o_chain_rid,
    int32_t* o_chain_w, int32_t* o_chain_kept, int64_t* o_chain_seed_off,
    int32_t* o_chain_nseeds, double* o_chain_frac, int64_t o_chain_cap,
    int64_t* out_counts) {
  int64_t n_out_seeds = 0, n_out_chains = 0;
  bool overflow = false;

  for (int64_t r = 0; r < n_reads && !overflow; ++r) {
    int64_t lo = bounds[r], hi = bounds[r + 1];
    int32_t lq = l_query[r];
    if (lq < min_seed_len || lo >= hi) continue;

    // frac_rep over SMEM groups with n_occ > max_occ
    // (reference: src/bwamem.c:415-421,459)
    int64_t b = 0, e = 0, l_rep = 0;
    for (int64_t i = lo; i < hi;) {
      int64_t j = i;
      while (j < hi && s_qbeg[j] == s_qbeg[i] && s_qend[j] == s_qend[i]) ++j;
      if (s_nocc[i] > max_occ) {
        if (s_qbeg[i] > e) {
          l_rep += e - b;
          b = s_qbeg[i];
          e = s_qend[i];
        } else {
          e = std::max<int64_t>(e, s_qend[i]);
        }
      }
      i = j;
    }
    l_rep += e - b;
    double frac_rep = lq ? (double)l_rep / lq : 0.0;

    // chaining with sorted-by-pos nearest-lower insertion
    std::vector<Chain> chains;
    std::vector<int64_t> keys;  // chains[i].pos, kept sorted
    for (int64_t i = lo; i < hi; ++i) {
      Seed s{s_rbeg[i], s_qbeg[i], s_qend[i] - s_qbeg[i]};
      int32_t rid = intv2rid(ann_off, n_ann, l_pac, s.rbeg, s.rbeg + s.len);
      if (rid < 0) continue;
      bool to_add = chains.empty();
      if (!to_add) {
        auto it = std::upper_bound(keys.begin(), keys.end(), s.rbeg);
        int64_t j = (int64_t)(it - keys.begin()) - 1;
        if (j < 0 ||
            !test_and_merge(w, max_chain_gap, l_pac, chains[j], s, rid))
          to_add = true;
      }
      if (to_add) {
        auto it = std::upper_bound(keys.begin(), keys.end(), s.rbeg);
        int64_t j = it - keys.begin();
        keys.insert(keys.begin() + j, s.rbeg);
        Chain c;
        c.pos = s.rbeg;
        c.rid = rid;
        c.seeds.push_back(s);
        chains.insert(chains.begin() + j, std::move(c));
      }
    }
    if (chains.empty()) continue;

    // filter (reference: src/bwamem.c:488-559)
    std::vector<int64_t> order;
    for (int64_t i = 0; i < (int64_t)chains.size(); ++i) {
      chains[i].w = chain_weight(chains[i]);
      if (chains[i].w >= min_chain_weight) order.push_back(i);
    }
    if (order.empty()) continue;
    std::stable_sort(order.begin(), order.end(), [&](int64_t x, int64_t y) {
      return chains[x].w > chains[y].w;
    });
    auto chn_beg = [&](const Chain& c) { return (int64_t)c.seeds[0].qbeg; };
    auto chn_end = [&](const Chain& c) {
      return (int64_t)c.seeds.back().qbeg + c.seeds.back().len;
    };
    chains[order[0]].kept = 3;
    std::vector<int64_t> kept_idx{0};
    for (int64_t i = 1; i < (int64_t)order.size(); ++i) {
      Chain& ci = chains[order[i]];
      bool large_ovlp = false, broke = false;
      for (int64_t j : kept_idx) {
        Chain& cj = chains[order[j]];
        int64_t b_max = std::max(chn_beg(cj), chn_beg(ci));
        int64_t e_min = std::min(chn_end(cj), chn_end(ci));
        bool cj_alt = ann_alt && ann_alt[cj.rid];
        bool ci_alt = ann_alt && ann_alt[ci.rid];
        // an ALT chain never shadows a primary chain
        // (reference: src/bwamem.c:517 `!a[j].is_alt || a[i].is_alt`)
        if (e_min > b_max && (!cj_alt || ci_alt)) {
          int64_t li = chn_end(ci) - chn_beg(ci);
          int64_t lj = chn_end(cj) - chn_beg(cj);
          int64_t min_l = std::min(li, lj);
          if (e_min - b_max >= min_l * mask_level &&
              min_l < max_chain_gap) {
            large_ovlp = true;
            if (cj.first < 0) cj.first = (int32_t)i;
            if (ci.w < cj.w * drop_ratio &&
                cj.w - ci.w >= (min_seed_len << 1)) {
              broke = true;
              break;
            }
          }
        }
      }
      if (!broke) {
        kept_idx.push_back(i);
        ci.kept = large_ovlp ? 2 : 3;
      }
    }
    for (int64_t j : kept_idx) {
      Chain& cj = chains[order[j]];
      if (cj.first >= 0) chains[order[cj.first]].kept = 1;
    }
    int64_t k = 0, cut = (int64_t)order.size();
    for (int64_t i = 0; i < (int64_t)order.size(); ++i) {
      Chain& c = chains[order[i]];
      if (c.kept == 0 || c.kept == 3) continue;
      if (++k >= max_chain_extend) {
        cut = i;
        break;
      }
    }
    for (int64_t i = cut; i < (int64_t)order.size(); ++i)
      if (chains[order[i]].kept < 3) chains[order[i]].kept = 0;

    // emit kept chains in filter order
    for (int64_t i = 0; i < (int64_t)order.size(); ++i) {
      Chain& c = chains[order[i]];
      if (c.kept == 0) continue;
      if (n_out_chains >= o_chain_cap ||
          n_out_seeds + (int64_t)c.seeds.size() > o_seed_cap) {
        overflow = true;
        break;
      }
      o_chain_read[n_out_chains] = (int32_t)r;
      o_chain_rid[n_out_chains] = c.rid;
      o_chain_w[n_out_chains] = c.w;
      o_chain_kept[n_out_chains] = c.kept;
      o_chain_seed_off[n_out_chains] = n_out_seeds;
      o_chain_nseeds[n_out_chains] = (int32_t)c.seeds.size();
      o_chain_frac[n_out_chains] = frac_rep;
      ++n_out_chains;
      for (const Seed& s : c.seeds) {
        o_seed_rbeg[n_out_seeds] = s.rbeg;
        o_seed_qbeg[n_out_seeds] = s.qbeg;
        o_seed_len[n_out_seeds] = s.len;
        ++n_out_seeds;
      }
    }
  }
  out_counts[0] = n_out_chains;
  out_counts[1] = n_out_seeds;
  out_counts[2] = overflow ? 1 : 0;
  return 0;
}
