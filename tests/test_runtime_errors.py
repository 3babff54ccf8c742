"""run_pipeline fail-fast error propagation (SURVEY §5 failure policy;
reference aborts on any stage error, seed_gen.cu:2037-2042).

A mid-stream reader error must surface within ~one chunk (not after the
collector drains the whole file), a writer error must not deadlock the
main thread on a full out-queue, and no pipeline thread may be leaked
blocked on a queue afterwards.
"""
import io
import threading
import time

import numpy as np
import pytest

from bwamem_tpu.index.build import build_index_from_codes
from bwamem_tpu.index.format import Annotation
from bwamem_tpu.io.fastx import SeqRecord
from bwamem_tpu.pipeline.aligner import MemAligner
from bwamem_tpu.pipeline.options import MemOptions
from bwamem_tpu.pipeline.runtime import run_pipeline


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(5)
    g = rng.integers(0, 4, 12000, dtype=np.uint8)
    ann = Annotation(names=["c"], lengths=[12000], offsets=[0])
    idx = build_index_from_codes(g, ann, sa_intv=8)
    return g, MemAligner(MemOptions(), idx)


def _records(g, n, fail_at=None, made=None):
    rng = np.random.default_rng(9)
    for i in range(n):
        if fail_at is not None and i == fail_at:
            raise ValueError(f"parse error at record {i}")
        if made is not None:
            made.append(i)
        pos = int(rng.integers(0, len(g) - 100))
        yield SeqRecord(name=f"r{i}", seq=g[pos:pos + 100].copy())


def _pipeline_threads():
    return [t for t in threading.enumerate()
            if t.name.startswith(("collect", "Thread-")) and t.is_alive()]


def test_reader_error_surfaces_promptly(setup):
    g, al = setup
    out = io.StringIO()
    made = []
    # chunk = 4 reads (400 bases); fail at record 10 => ~2 full chunks
    # exist before the error. The error must surface without the
    # pipeline processing any further chunks after it is raised.
    with pytest.raises(ValueError, match="parse error at record 10"):
        run_pipeline(_records(g, 400, fail_at=10, made=made), al,
                     chunk_bases=400, out=out)
    # reader died at record 10: nothing past it was ever pulled
    assert max(made) == 9


def test_writer_error_does_not_deadlock(setup):
    g, al = setup

    class BoomWriter:
        def __init__(self):
            self.writes = 0

        def write(self, s):
            self.writes += 1
            raise OSError("disk full")

    t0 = time.monotonic()
    with pytest.raises(OSError, match="disk full"):
        run_pipeline(_records(g, 64), al, chunk_bases=400, out=BoomWriter())
    # must fail fast, not hang until a timeout unblocks a full queue
    assert time.monotonic() - t0 < 60


def test_no_leaked_blocked_reader(setup):
    """A finalize-side error must release a reader blocked on a full
    in-queue (the round-2 version leaked it behind a 1s join timeout)."""
    g, al = setup

    before = set(threading.enumerate())
    out = io.StringIO()
    with pytest.raises(ValueError):
        run_pipeline(_records(g, 400, fail_at=40), al,
                     chunk_bases=400, out=out)
    # every thread the pipeline started must have exited
    deadline = time.monotonic() + 10
    while time.monotonic() < deadline:
        leaked = [t for t in set(threading.enumerate()) - before
                  if t.is_alive()]
        if not leaked:
            break
        time.sleep(0.1)
    assert not leaked, f"leaked pipeline threads: {leaked}"


def test_clean_run_still_ordered(setup):
    """The hardening must not perturb the normal path: ordered output,
    every read present exactly once."""
    g, al = setup
    out = io.StringIO()
    n = run_pipeline(_records(g, 32), al, chunk_bases=300, out=out)
    assert n == 32
    names = [ln.split("\t")[0] for ln in out.getvalue().splitlines()
             if ln and not ln.startswith("@")]
    primaries = [nm for i, nm in enumerate(names)
                 if nm != names[i - 1] or i == 0]
    # primary order == input order (dups are supplementary/secondary)
    seen = []
    for nm in names:
        if nm not in seen:
            seen.append(nm)
    assert seen == [f"r{i}" for i in range(32)]
