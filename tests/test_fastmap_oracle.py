"""fastmap differential test vs vanilla `bwa fastmap`.

The SAM concordance suite validates the whole pipeline; this points the
same independent oracle at the SEEDING stage alone: `bwa fastmap` prints
the raw SMEM list (qb, qe, occ + coordinates) straight out of bwt_smem1,
so any deviation in the device forward/backward scans, the containment
filter, occurrence expansion or SA resolution shows up here without
chaining/extension masking it. Reference twin: the vestigial
main_fastmap (src/fastmap.c:559-633), identical to vanilla's.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

from bwamem_tpu.utils.simgenome import (make_repeat_genome, simulate_reads,
                                        write_fasta, write_fastq)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from concordance import ensure_oracle  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/bwa_index"),
    reason="reference bwa tree not present")


def parse_fastmap(text: str) -> dict:
    """-> {read: set of (qb, qe, occ, sorted locs or ('*',))}. EM order
    within a read is iteration-order-dependent in vanilla (pivot batches),
    so records compare as sets."""
    out, cur = {}, None
    for ln in text.splitlines():
        f = ln.split("\t")
        if f[0] == "SQ":
            cur = f[1]
            out[cur] = set()
        elif f[0] == "EM":
            out[cur].add((int(f[1]), int(f[2]), int(f[3]),
                          tuple(sorted(f[4:]))))
    return out


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fastmap"))
    rng = np.random.default_rng(77)
    contigs, _ = make_repeat_genome(rng, 120_000)
    fasta = os.path.join(d, "g.fa")
    write_fasta(fasta, contigs)
    reads = simulate_reads(rng, contigs, 120, 150)
    # a few reads with ambiguous bases: N resets the SMEM walk in both
    for r in reads[:12]:
        s = bytearray(r.seq, "ascii")
        s[20] = ord("N")
        s[77] = ord("N")
        r.seq = s.decode()
    fq = os.path.join(d, "r.fq")
    write_fastq(fq, reads)
    oracle = ensure_oracle()
    subprocess.run([oracle, "index", "-p", os.path.join(d, "vidx"), fasta],
                   check=True, capture_output=True)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO + os.pathsep + os.environ.get(
                   "PYTHONPATH", ""))
    subprocess.run(
        [sys.executable, "-m", "bwamem_tpu", "index", fasta, "-p",
         os.path.join(d, "tidx")], check=True, env=env,
        capture_output=True)
    return d, fq, oracle, env


@pytest.mark.parametrize("flags", [(), ("-l", "25"), ("-w", "3")],
                         ids=["default", "min_len_25", "width_3"])
def test_fastmap_matches_vanilla(world, flags):
    d, fq, oracle, env = world
    van = subprocess.run(
        [oracle, "fastmap", *flags, os.path.join(d, "vidx"), fq],
        check=True, capture_output=True, text=True)
    ours = subprocess.run(
        [sys.executable, "-m", "bwamem_tpu", "fastmap", *flags,
         os.path.join(d, "tidx"), fq],
        check=True, capture_output=True, text=True, env=env)
    a, b = parse_fastmap(van.stdout), parse_fastmap(ours.stdout)
    assert set(a) == set(b)
    diffs = {k: (sorted(a[k] - b[k]), sorted(b[k] - a[k]))
             for k in a if a[k] != b[k]}
    assert not diffs, list(diffs.items())[:3]
