// FASTA/FASTQ chunk parser + 2-bit base encoder, written from scratch for
// the bwamem_tpu host runtime.
//
// Role in the framework: the data-loader half of the reference's
// bseq_read/kseq stack (reference: src/bwa.c:42 bseq_read, src/kseq.h) —
// the reference parses with a C lexer on the input thread of its 3-stage
// pipeline; the Python fallback in io/fastx.py does the same work ~20x
// slower, which matters once the device stages are fast.
//
// API (ctypes), operating on a caller-provided buffer of raw file bytes:
//
//   int64_t bm_fastx_scan(const char* buf, int64_t n, int is_final,
//                         int64_t* rec_out /* cap*5 */, int64_t cap,
//                         int64_t* n_records_out);
//     Scans complete records from buf[0:n]. For each record writes 5
//     int64s: name_beg, name_end, seq_beg, seq_end, qual_beg (-1 for
//     FASTA; qual run has the same length as the sequence). Multi-line
//     FASTA sequences are NOT supported by the scanner (records fall back
//     to the Python parser; FASTQ and single-line FASTA — the dominant
//     short-read formats — are). Returns the number of bytes consumed
//     (start offset of the first incomplete record), or -1 when a record
//     looks multi-line/malformed. When is_final is set, a trailing record
//     without a final newline is accepted.
//
//   void bm_encode_bases(const char* seq, int64_t n, uint8_t* out);
//     ASCII -> codes: ACGTacgt -> 0..3, everything else -> 4.

#include <cstdint>
#include <cstring>

namespace {

inline const char* find_nl(const char* p, const char* end) {
  const void* q = memchr(p, '\n', (size_t)(end - p));
  return q ? (const char*)q : nullptr;
}

}  // namespace

extern "C" int64_t bm_fastx_scan(const char* buf, int64_t n, int is_final,
                                 int64_t* rec_out, int64_t cap,
                                 int64_t* n_records_out) {
  const char* p = buf;
  const char* end = buf + n;
  int64_t nrec = 0;
  *n_records_out = 0;
  while (p < end && nrec < cap) {
    if (*p == '\r' || *p == '\n') {
      ++p;
      continue;
    }
    const char* rec_start = p;
    if (*p == '@') {  // FASTQ
      const char* hdr_end = find_nl(p, end);
      if (!hdr_end) break;
      const char* seq_beg = hdr_end + 1;
      const char* seq_end = find_nl(seq_beg, end);
      if (!seq_end) break;
      const char* plus = seq_end + 1;
      if (plus >= end) break;
      if (*plus != '+') return -1;  // multi-line FASTQ: bail to Python
      const char* plus_end = find_nl(plus, end);
      if (!plus_end) break;
      const char* qual_beg = plus_end + 1;
      int64_t seq_len = seq_end - seq_beg;
      if (seq_len > 0 && seq_beg[seq_len - 1] == '\r') --seq_len;
      const char* qual_end = qual_beg + seq_len;
      if (qual_end > end) break;
      if (qual_end < end && *qual_end != '\n' && *qual_end != '\r')
        return -1;  // quality length mismatch
      if (qual_end == end && !is_final) break;
      // name: up to first space/tab in the header
      const char* nb = p + 1;
      const char* ne = nb;
      while (ne < hdr_end && *ne != ' ' && *ne != '\t' && *ne != '\r') ++ne;
      rec_out[nrec * 5 + 0] = nb - buf;
      rec_out[nrec * 5 + 1] = ne - buf;
      rec_out[nrec * 5 + 2] = seq_beg - buf;
      rec_out[nrec * 5 + 3] = seq_beg - buf + seq_len;
      rec_out[nrec * 5 + 4] = qual_beg - buf;
      ++nrec;
      p = qual_end;
      if (p < end && *p == '\r') ++p;
      if (p < end && *p == '\n') ++p;
    } else if (*p == '>') {  // single-line FASTA
      const char* hdr_end = find_nl(p, end);
      if (!hdr_end) break;
      const char* seq_beg = hdr_end + 1;
      const char* seq_end = find_nl(seq_beg, end);
      const char* eff_end = seq_end ? seq_end : end;
      if (!seq_end && !is_final) break;
      // multi-line FASTA? next non-empty line that isn't '>' means yes
      if (seq_end) {
        const char* nxt = seq_end + 1;
        while (nxt < end && (*nxt == '\n' || *nxt == '\r')) ++nxt;
        if (nxt < end && *nxt != '>' && *nxt != '@') return -1;
        if (nxt == end && !is_final) break;  // can't tell yet
      }
      int64_t seq_len = eff_end - seq_beg;
      if (seq_len > 0 && seq_beg[seq_len - 1] == '\r') --seq_len;
      const char* nb = p + 1;
      const char* ne = nb;
      while (ne < hdr_end && *ne != ' ' && *ne != '\t' && *ne != '\r') ++ne;
      rec_out[nrec * 5 + 0] = nb - buf;
      rec_out[nrec * 5 + 1] = ne - buf;
      rec_out[nrec * 5 + 2] = seq_beg - buf;
      rec_out[nrec * 5 + 3] = seq_beg - buf + seq_len;
      rec_out[nrec * 5 + 4] = -1;
      ++nrec;
      p = seq_end ? seq_end + 1 : end;
    } else {
      return -1;  // unknown leader byte
    }
    (void)rec_start;
  }
  *n_records_out = nrec;
  return p - buf;
}

extern "C" void bm_encode_bases(const char* seq, int64_t n, uint8_t* out) {
  static uint8_t lut[256];
  static bool init = false;
  if (!init) {
    memset(lut, 4, sizeof(lut));
    lut[(unsigned)'A'] = lut[(unsigned)'a'] = 0;
    lut[(unsigned)'C'] = lut[(unsigned)'c'] = 1;
    lut[(unsigned)'G'] = lut[(unsigned)'g'] = 2;
    lut[(unsigned)'T'] = lut[(unsigned)'t'] = 3;
    init = true;
  }
  for (int64_t i = 0; i < n; ++i) out[i] = lut[(unsigned char)seq[i]];
}
