"""CLI-surface IO tests: gzip inputs, stdin, error exit codes.

Each runs the real `python -m bwamem_tpu` entry point in a subprocess
(CPU platform for speed), the way a user invokes it.
"""
import gzip
import os
import subprocess
import sys

import numpy as np
import pytest

ENV = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": "/root/repo"}


def _run(args, stdin=None):
    return subprocess.run(
        [sys.executable, "-m", "bwamem_tpu", *args],
        input=stdin, capture_output=True, cwd="/root/repo", env=ENV)


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    d = tmp_path_factory.mktemp("cliio")
    rng = np.random.default_rng(1)
    G = 50_000
    g = rng.integers(0, 4, G, dtype=np.uint8)
    B = "ACGT"
    s = "".join(B[c] for c in g)
    (d / "ref.fa").write_text(
        ">c1\n" + "\n".join(s[i:i + 70] for i in range(0, G, 70)) + "\n")
    lines = []
    for i in range(8):
        p = int(rng.integers(0, G - 120))
        lines.append(f"@r{i}\n{s[p:p+120]}\n+\n{'I' * 120}\n")
    fq = "".join(lines)
    (d / "r.fq").write_text(fq)
    (d / "r.fq.gz").write_bytes(gzip.compress(fq.encode()))
    r = _run(["index", str(d / "ref.fa"), "-p", str(d / "idx")])
    assert r.returncode == 0, r.stderr[-400:]
    return d, fq


def _records(out: bytes) -> list[str]:
    return [ln for ln in out.decode().splitlines()
            if ln and not ln.startswith("@")]


def test_gz_matches_plain(world):
    d, _ = world
    a = _run(["align", "-t", "1", str(d / "idx"), str(d / "r.fq")])
    b = _run(["align", "-t", "1", str(d / "idx"), str(d / "r.fq.gz")])
    assert a.returncode == 0 and b.returncode == 0
    assert _records(a.stdout) == _records(b.stdout)
    assert len(_records(a.stdout)) >= 8


def test_stdin_dash(world):
    d, fq = world
    a = _run(["align", "-t", "1", str(d / "idx"), "-"],
             stdin=fq.encode())
    assert a.returncode == 0, a.stderr[-400:]
    assert len(_records(a.stdout)) >= 8


def test_error_exit_codes(world):
    d, _ = world
    r = _run(["align", str(d / "nope"), str(d / "r.fq")])
    assert r.returncode == 1
    assert b"[bwamem-tpu] error:" in r.stderr
    trunc = d / "t.fq.gz"
    trunc.write_bytes((d / "r.fq.gz").read_bytes()[:40])
    r = _run(["align", "-t", "1", str(d / "idx"), str(trunc)])
    assert r.returncode == 1
    assert b"[bwamem-tpu] error:" in r.stderr


def test_thread_count_byte_parity(world):
    """-t 1/2/4 must produce byte-identical SAM (PARITY.md row 3: the
    fork-pool analog of kt_for must not change output with worker
    count; reference src/kthread.c:59-222 partitions work but the
    ordered 3-stage pipeline makes output order thread-invariant).
    Enough reads that the pool actually splits work across workers."""
    d, fq = world
    rng = np.random.default_rng(5)
    G = 50_000
    # reuse the module genome via its FASTA text
    s = (d / "ref.fa").read_text().split("\n", 1)[1].replace("\n", "")
    lines = []
    for i in range(300):
        p = int(rng.integers(0, G - 120))
        lines.append(f"@t{i}\n{s[p:p+120]}\n+\n{'I' * 120}\n")
    (d / "many.fq").write_text("".join(lines))
    outs = []
    for t in ("1", "2", "4"):
        r = _run(["align", "-t", t, str(d / "idx"), str(d / "many.fq")])
        assert r.returncode == 0, r.stderr[-400:]
        body = [ln for ln in r.stdout.decode().splitlines()
                if not ln.startswith("@PG")]
        outs.append(body)
    assert outs[0] == outs[1] == outs[2]
