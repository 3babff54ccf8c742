"""Flag-matrix concordance vs the vanilla bwa oracle.

The default-flag concordance suite (test_bwa_concordance.py) pins the
default code path to BWA semantics; this matrix points the same
independent oracle at the OPTION surface — every cell runs both tools
with one non-default flag and requires the same agreement bar.  This is
the only way to catch a flag that parses fine but maps to the wrong
knob (e.g. a gap-extend that only reaches one side of the DP, or a -T
applied before rescue instead of after), because the repo's own goldens
are all recorded at defaults.

Oracle invocation matches the fork's mem_opt_init deltas (-w 300 -d 0;
reference: src/bwamem.c:109-112) plus the cell's flag, mirroring how the
reference validates itself against its bundled vanilla bwa.
"""
import os
import sys

import numpy as np
import pytest

from bwamem_tpu.utils.simgenome import (
    make_repeat_genome, simulate_pairs, simulate_reads, write_fasta,
    write_fastq)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from concordance import (  # noqa: E402
    compare, ensure_oracle, parse_sam, run_ours, run_vanilla_bwa)

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/bwa_index"),
    reason="reference bwa tree not present")


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("concflag"))
    rng = np.random.default_rng(51)
    contigs, _ = make_repeat_genome(rng, 150_000)
    fasta = os.path.join(d, "g.fa")
    write_fasta(fasta, contigs)

    reads = simulate_reads(rng, contigs, 400, 150)
    fq = os.path.join(d, "se.fq")
    write_fastq(fq, reads)

    pairs = simulate_pairs(rng, contigs, 150, 150)
    fq1 = os.path.join(d, "pe1.fq")
    fq2 = os.path.join(d, "pe2.fq")
    write_fastq(fq1, [a for a, _ in pairs])
    write_fastq(fq2, [b for _, b in pairs])
    ensure_oracle()
    return d, fasta, fq, (fq1, fq2), len(reads), len(pairs), contigs


# (id, extra CLI flags — identical for both tools, SE agreement floor)
# Floors sit slightly under the default-path bar: non-default scoring
# creates more legitimate repeat ties on this dense-repeat genome.
SE_CELLS = [
    ("all_hits", ["-a"], 99.0),
    ("min_score_50", ["-T", "50"], 99.0),
    ("clip_pen_10", ["-L", "10"], 99.0),
    ("gap_open_10", ["-O", "10"], 99.0),
    ("gap_ext_2", ["-E", "2"], 99.0),
    ("mismatch_2", ["-B", "2"], 98.5),
    ("match_2_rescale", ["-A", "2"], 98.5),
    ("seed_len_25", ["-k", "25"], 99.0),
    ("max_occ_100", ["-c", "100"], 99.0),
    ("reseed_1.0", ["-r", "1.0"], 99.0),
    ("mapq_seedcov", ["-Q", "0"], 99.0),
    ("chain_extend_3", ["-N", "3"], 98.5),
    ("r3_thresh_10", ["-y", "10"], 99.0),
]


@pytest.mark.parametrize("name,flags,floor",
                         SE_CELLS, ids=[c[0] for c in SE_CELLS])
def test_se_flag_cell(world, name, flags, floor):
    d, fasta, fq, _, n_reads, _, _ = world
    theirs = parse_sam(run_vanilla_bwa(d, fasta, fq, extra=tuple(flags)))
    ours = parse_sam(run_ours(d, fasta, fq, extra=tuple(flags)))
    rep = compare(ours, theirs, 150)
    assert rep["total"] == n_reads, (name, rep["counts"])
    assert rep["agree_pct"] >= floor, (name, rep["counts"],
                                       rep["examples"].get("diff"))
    assert rep["mapq_within_5"] >= 96.0, (name, rep["mapq_delta"])


def test_longread_pacbio_preset(world):
    """-x pacbio on 1 kbp 10%-error reads: the preset rewires scoring
    (A1 B1 O1 E1 L0), seeding (k17, split_factor 10) and chain filtering
    (min_chain_weight 40) all at once — reference mode block
    src/fastmap.c:358-374 — and routes the banded long-read kernel, so
    one cell covers the whole preset plumbing against the oracle."""
    d, fasta, _, _, _, _, contigs = world
    rng = np.random.default_rng(91)
    reads = simulate_reads(rng, contigs, 40, read_len=1000,
                           sub=0.04, ins=0.03, dele=0.03, prefix="pb")
    fq = os.path.join(d, "pb.fq")
    write_fastq(fq, reads)
    theirs = parse_sam(run_vanilla_bwa(d, fasta, fq,
                                       extra=("-x", "pacbio")))
    ours = parse_sam(run_ours(d, fasta, fq, extra=("-x", "pacbio")))
    rep = compare(ours, theirs, 1000)
    assert rep["total"] == len(reads), rep["counts"]
    assert rep["agree_pct"] >= 95.0, (rep["counts"],
                                      rep["examples"].get("diff"))
    assert rep["mapq_within_5"] >= 95.0, rep["mapq_delta"]


PE_CELLS = [
    ("pe_unpaired_pen_9", ["-U", "9"], 99.0),
    ("pe_all_hits", ["-a"], 99.0),
    ("pe_skip_rescue", ["-S"], 98.5),
]


@pytest.mark.parametrize("name,flags,floor",
                         PE_CELLS, ids=[c[0] for c in PE_CELLS])
def test_pe_flag_cell(world, name, flags, floor):
    d, fasta, _, (fq1, fq2), _, n_pairs, _ = world
    theirs = parse_sam(run_vanilla_bwa(d, fasta, fq1, fq2,
                                       extra=tuple(flags)))
    ours = parse_sam(run_ours(d, fasta, fq1, fq2, extra=tuple(flags)))
    rep = compare(ours, theirs, 150)
    assert rep["total"] == 2 * n_pairs, (name, rep["counts"])
    assert rep["agree_pct"] >= floor, (name, rep["counts"],
                                       rep["examples"].get("diff"))


def test_pe_interleaved_smart_pairing(world):
    """-p (smart pairing): one interleaved file must produce the same
    alignments both tools get from the two-file form (reference:
    MEM_F_SMARTPE, src/fastmap.c:175)."""
    d, fasta, _, (fq1, fq2), _, n_pairs, _ = world
    inter = os.path.join(d, "inter.fq")
    with open(fq1) as a, open(fq2) as b, open(inter, "w") as o:
        while True:
            ra = [a.readline() for _ in range(4)]
            rb = [b.readline() for _ in range(4)]
            if not ra[0]:
                break
            o.writelines(ra)
            o.writelines(rb)
    theirs = parse_sam(run_vanilla_bwa(d, fasta, inter, extra=("-p",)))
    ours = parse_sam(run_ours(d, fasta, inter, extra=("-p",)))
    rep = compare(ours, theirs, 150)
    assert rep["total"] == 2 * n_pairs, rep["counts"]
    assert rep["agree_pct"] >= 99.0, (rep["counts"],
                                      rep["examples"].get("diff"))


def test_pe_fixed_insert_model(world):
    """-I mean,std: the fixed insert-size model replaces chunk inference
    (pes0, reference: src/fastmap.c:230-247) in both tools."""
    d, fasta, _, (fq1, fq2), _, n_pairs, _ = world
    theirs = parse_sam(run_vanilla_bwa(d, fasta, fq1, fq2,
                                       extra=("-I", "350,50")))
    ours = parse_sam(run_ours(d, fasta, fq1, fq2, extra=("-I", "350,50")))
    rep = compare(ours, theirs, 150)
    assert rep["total"] == 2 * n_pairs, rep["counts"]
    assert rep["agree_pct"] >= 99.0, (rep["counts"],
                                      rep["examples"].get("diff"))
