"""Golden-output snapshot tests.

A deterministic mini corpus (fixed RNG seeds) aligned SE and PE; outputs
are compared byte-for-byte against checked-in snapshots in tests/data/.
Any intentional output change must regenerate them
(`python tests/test_golden.py --regen`) and the diff reviews as part of
the change. This pins the full stack: seeding, chaining, extension,
dedup, mark-primary, mapQ, pairing, CIGAR/NM/MD, tags, SAM formatting.
"""
import os
import sys

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")


def _world():
    from bwamem_tpu.index.build import build_index_from_codes
    from bwamem_tpu.index.format import Annotation

    rng = np.random.default_rng(4242)
    G = 250_000
    g = rng.integers(0, 4, G, dtype=np.uint8)
    idx = build_index_from_codes(
        g, Annotation(names=["cA", "cB"], lengths=[150_000, 100_000],
                      offsets=[0, 150_000]), sa_intv=8)
    return g, idx


def _se_reads(g, n=48, L=150):
    rng = np.random.default_rng(77)
    G = len(g)
    names, seqs = [], []
    for i in range(n):
        p = int(rng.integers(0, G - L - 10))
        if i % 5 == 4:
            r = g[p:p + L + 3].copy()
            cut = int(rng.integers(30, L - 30))
            r = np.delete(r, slice(cut, cut + 3))[:L]
        else:
            r = g[p:p + L].copy()
        e = rng.random(len(r)) < 0.02
        r[e] = (r[e] + 1) % 4
        if i % 2:
            r = (3 - r)[::-1]
        names.append(f"g{i}")
        seqs.append(r)
    return names, seqs


def _pe_reads(g, n=24, L=150):
    rng = np.random.default_rng(88)
    G = len(g)
    names, seqs = [], []
    for i in range(n):
        p = int(rng.integers(0, G - 400))
        frag = g[p:p + 300]
        r1 = frag[:L].copy()
        r2 = (3 - frag[-L:])[::-1].copy()
        for r in (r1, r2):
            e = rng.random(L) < 0.01
            r[e] = (r[e] + 1) % 4
        names += [f"h{i}", f"h{i}"]
        seqs += [r1, r2]
    return names, seqs


def _generate():
    from bwamem_tpu.pipeline.aligner import MemAligner
    from bwamem_tpu.pipeline.options import MemOptions, MEM_F_PE

    g, idx = _world()
    al = MemAligner(MemOptions(), idx)
    se = al.align_batch(*_se_reads(g))
    opt = MemOptions()
    opt.flag |= MEM_F_PE
    al2 = MemAligner(opt, idx)
    pe = al2.align_pairs_batch(*_pe_reads(g))
    return se, pe


def test_golden_outputs():
    se_path = os.path.join(DATA, "golden_se.sam")
    pe_path = os.path.join(DATA, "golden_pe.sam")
    if not (os.path.exists(se_path) and os.path.exists(pe_path)):
        pytest.skip("golden snapshots not generated")
    se, pe = _generate()
    with open(se_path) as f:
        assert f.read().splitlines() == se, "SE output drifted from golden"
    with open(pe_path) as f:
        assert f.read().splitlines() == pe, "PE output drifted from golden"


if __name__ == "__main__" and "--regen" in sys.argv:
    os.makedirs(DATA, exist_ok=True)
    se, pe = _generate()
    with open(os.path.join(DATA, "golden_se.sam"), "w") as f:
        f.write("\n".join(se) + "\n")
    with open(os.path.join(DATA, "golden_pe.sam"), "w") as f:
        f.write("\n".join(pe) + "\n")
    print(f"regenerated: {len(se)} SE + {len(pe)} PE records")
