// SA-IS suffix array construction (Nong, Zhang & Chan, 2009), written from
// scratch for the bwamem_tpu index toolchain. Linear time, linear memory.
//
// Role in the framework: offline index build for large genomes — the
// reference builds its suffix array inside `bwa index` (reference:
// bwa_index/bwtindex.c:288 bwa_idx_build -> is.c / bwt_gen.c); we build the
// full SA here and derive BWT/occ/sampled-SA from it in Python.
//
// API (ctypes):
//   int bm_sais_u8(const uint8_t* s, int64_t* sa, int64_t n, int64_t k);
//     s: sequence of symbols in [0, k); sa: output array of length n.
//     The terminal sentinel is implicit (virtual empty suffix excluded,
//     matching the NumPy fallback in index/suffix_array.py).

#include <cstdint>
#include <vector>

namespace {

typedef int64_t idx_t;

template <typename T>
static void sais_core(const T* s, idx_t* sa, idx_t n, idx_t k) {
  if (n == 0) return;
  if (n == 1) { sa[0] = 0; return; }

  // Type classification against a virtual terminal sentinel (smallest):
  // the last suffix is L-type (its symbol > sentinel).
  std::vector<uint8_t> ls(n);  // 1 = S-type, 0 = L-type
  ls[n - 1] = 0;
  for (idx_t i = n - 2; i >= 0; --i)
    ls[i] = (s[i] < s[i + 1] || (s[i] == s[i + 1] && ls[i + 1])) ? 1 : 0;

  std::vector<idx_t> bkt(k + 1);
  auto bucket_bounds = [&](bool end) {
    std::fill(bkt.begin(), bkt.end(), 0);
    for (idx_t i = 0; i < n; ++i) bkt[s[i]]++;
    idx_t sum = 0;
    for (idx_t c = 0; c <= k; ++c) {
      sum += bkt[c];
      bkt[c] = end ? sum : sum - bkt[c];
    }
  };

  auto is_lms = [&](idx_t i) { return i > 0 && ls[i] && !ls[i - 1]; };

  auto induce = [&]() {
    // Induce L-type suffixes left-to-right from bucket fronts.
    bucket_bounds(false);
    sa[bkt[s[n - 1]]++] = n - 1;  // predecessor of the virtual sentinel
    for (idx_t i = 0; i < n; ++i) {
      idx_t j = sa[i];
      if (j > 0 && !ls[j - 1]) sa[bkt[s[j - 1]]++] = j - 1;
    }
    // Induce S-type suffixes right-to-left from bucket ends.
    bucket_bounds(true);
    for (idx_t i = n - 1; i >= 0; --i) {
      idx_t j = sa[i];
      if (j > 0 && ls[j - 1]) sa[--bkt[s[j - 1]]] = j - 1;
    }
  };

  // Step 1: drop LMS suffixes at their bucket ends (text order), induce.
  std::fill(sa, sa + n, (idx_t)-1);
  bucket_bounds(true);
  for (idx_t i = 1; i < n; ++i)
    if (is_lms(i)) sa[--bkt[s[i]]] = i;
  induce();

  // Step 2: LMS substrings are now sorted; compact and name them.
  idx_t n1 = 0;
  for (idx_t i = 0; i < n; ++i)
    if (sa[i] > 0 && is_lms(sa[i])) sa[n1++] = sa[i];

  idx_t* name = sa + n1;  // names keyed by pos/2, in sa[n1..n)
  for (idx_t i = n1; i < n; ++i) sa[i] = -1;
  idx_t names = 0;
  idx_t prev = -1;
  for (idx_t i = 0; i < n1; ++i) {
    idx_t pos = sa[i];
    bool same = false;
    if (prev != -1) {
      same = true;
      for (idx_t d = 0;; ++d) {
        if (prev + d == n || pos + d == n) { same = false; break; }
        if (s[prev + d] != s[pos + d] || ls[prev + d] != ls[pos + d]) {
          same = false;
          break;
        }
        if (d > 0 && (is_lms(prev + d) || is_lms(pos + d))) {
          same = is_lms(prev + d) && is_lms(pos + d);
          break;
        }
      }
    }
    if (!same) ++names;
    name[pos / 2] = names - 1;
    prev = pos;
  }

  // Compact names (text order of LMS positions) in place: s1 = sa[n1..2*n1).
  // Forward in-place compaction is safe (write index <= read index).
  idx_t* s1 = sa + n1;
  {
    idx_t w = 0;
    for (idx_t i = 0; i < n - n1; ++i)
      if (name[i] != -1) s1[w++] = name[i];
  }

  // Step 3: recurse if LMS substring names are not yet unique.
  if (names < n1) {
    sais_core<idx_t>(s1, sa, n1, names > 0 ? names - 1 : 0);
  } else {
    for (idx_t i = 0; i < n1; ++i) sa[s1[i]] = i;
  }

  // Step 4: map the sorted LMS order back to text positions and re-induce.
  {
    idx_t j = 0;
    for (idx_t i = 1; i < n; ++i)
      if (is_lms(i)) s1[j++] = i;
  }
  for (idx_t i = 0; i < n1; ++i) sa[i] = s1[sa[i]];
  for (idx_t i = n1; i < n; ++i) sa[i] = -1;
  bucket_bounds(true);
  for (idx_t i = n1 - 1; i >= 0; --i) {
    idx_t j = sa[i];
    sa[i] = -1;
    sa[--bkt[s[j]]] = j;
  }
  induce();
}

}  // namespace

extern "C" {

int bm_sais_u8(const uint8_t* s, idx_t* sa, idx_t n, idx_t k) {
  if (n < 0 || k <= 0) return -1;
  sais_core<uint8_t>(s, sa, n, k - 1);
  return 0;
}

}  // extern "C"
