#!/bin/bash
# Build the vanilla-bwa oracle binary used by tools/concordance.py.
#
# The prebuilt /root/reference/bwa_index/bwa was last compiled with
# OCC_INTV_SHIFT=6 (the GPU-occ index stage of build_index.sh); its
# bwt_bwt()/bwt_occ_intv() macros are only correct at OCC_INTERVAL=0x80,
# so `bwa index -s sa` and `bwa mem` segfault.  build_index.sh itself
# recompiles at shift 7 for the SA stage — we do the same, out-of-tree
# (the reference is read-only), and keep THAT binary as the oracle.
set -e
DST=${1:-/tmp/vanilla_bwa}
if [ -x "$DST/bwa" ]; then exit 0; fi
mkdir -p "$DST"
cp /root/reference/bwa_index/*.c /root/reference/bwa_index/*.h \
   /root/reference/bwa_index/Makefile "$DST/"
sed -i 's,#define OCC_INTV_SHIFT.*,#define OCC_INTV_SHIFT 7,' "$DST/bwt.h"
# The tree's bwt_restore_sa is write/read inconsistent (dump emits uint32
# SA entries + pack_size + packed upper bits; restore reads 8-byte entries
# and never reads pack_size, so `mem` dies with EOF then div-by-zero in
# bwt_sa).  Patch restore to read the packed format it actually dumps.
python3 - "$DST/bwt.c" <<'EOF'
import sys
p = sys.argv[1]
src = open(p).read()
old = """	bwt->n_sa = (bwt->seq_len + bwt->sa_intv) / bwt->sa_intv;
	//bwt->sa = (bwtint_t*)calloc(bwt->n_sa, sizeof(bwtint_t));
	bwt->sa = (uint32_t*)calloc(bwt->n_sa, sizeof(uint32_t));
	bwt->sa_bits = (uint32_t*)calloc(bwt->pack_size * bwt->n_sa / 32 + 1, sizeof(uint32_t));
	//bwt->sa[0] = -1;
	bwt->sa[0] = -1;
	bwt->sa_bits[0] |= bwt->pack_mask;


	fread_fix(fp, sizeof(bwtint_t) * (bwt->n_sa - 1), bwt->sa + 1);
	// haven't really restored bwt->sa_bits yet, but dunno if it will be needed here
	err_fclose(fp);"""
new = """	bwt->n_sa = (bwt->seq_len + bwt->sa_intv) / bwt->sa_intv;
	bwt->sa = (uint32_t*)calloc(bwt->n_sa, sizeof(uint32_t));
	bwt->sa[0] = -1;
	fread_fix(fp, sizeof(uint32_t) * (bwt->n_sa - 1), bwt->sa + 1);
	err_fread_noeof(&bwt->pack_size, sizeof(uint8_t), 1, fp);
	bwt->pack_mask = bwt->pack_size >= 32 ? 0xFFFFFFFFu : ((1u << bwt->pack_size) - 1);
	bwt->sa_bits = (uint32_t*)calloc(bwt->pack_size * bwt->n_sa / 32 + 1, sizeof(uint32_t));
	fread_fix(fp, sizeof(uint32_t) * (bwt->pack_size * bwt->n_sa / 32 + 1), bwt->sa_bits);
	err_fclose(fp);"""
assert old in src, "bwt_restore_sa body not found"
open(p, "w").write(src.replace(old, new))
EOF
# modern gcc defaults -fno-common; the 2017-era tree needs -fcommon
make -C "$DST" -j4 CFLAGS="-g -Wall -Wno-unused-function -O2 -fcommon" \
    >/dev/null 2>"$DST/build.log" || {
  tail -20 "$DST/build.log"; exit 1; }
echo "oracle bwa built at $DST/bwa" >&2
