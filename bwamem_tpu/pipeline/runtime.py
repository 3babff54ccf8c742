"""Three-stage read -> align -> write pipeline runtime.

Equivalent of the reference's kt_pipeline (reference: src/kthread.c:277-348,
launched at src/fastmap.c:528 with 2 pipeline workers over 3 steps): stage 0
reads and chunks input on a producer thread, stage 1 runs the aligner
(device work), stage 2 writes SAM in input order. Queues give the same
double-buffering the reference gets from its pipeline mutex dance: the
reader prefetches chunk N+1 while the device aligns chunk N and the writer
drains chunk N-1. TPU kernels release the GIL during execution, so host
threads genuinely overlap with device time.
"""
from __future__ import annotations

import queue
import sys
import threading
from typing import Iterable, Iterator, TextIO

from ..io.fastx import SeqRecord, chunk_records
from ..utils.timing import Timings

_STOP = object()


def run_pipeline(records: Iterator[SeqRecord], aligner, chunk_bases: int,
                 out: TextIO, timings: Timings | None = None,
                 queue_depth: int = 2, paired: bool = False) -> int:
    """Stream records through the aligner; returns #reads processed."""
    timings = timings or Timings()
    in_q: queue.Queue = queue.Queue(maxsize=queue_depth)
    out_q: queue.Queue = queue.Queue(maxsize=queue_depth)
    errors: list[BaseException] = []

    def reader():
        try:
            for batch in chunk_records(records, chunk_bases, paired=paired):
                in_q.put(batch)
        except BaseException as e:  # noqa: BLE001
            errors.append(e)
        finally:
            in_q.put(_STOP)

    def writer():
        try:
            while True:
                item = out_q.get()
                if item is _STOP:
                    return
                with timings.span("sam_write"):
                    for line in item:
                        out.write(line)
                        out.write("\n")
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    rt = threading.Thread(target=reader, daemon=True)
    wt = threading.Thread(target=writer, daemon=True)
    rt.start()
    wt.start()

    n_processed = 0
    try:
        while True:
            batch = in_q.get()
            if batch is _STOP:
                break
            with timings.span("align_chunk"):
                if paired:
                    lines = aligner.align_pairs_batch(
                        [r.name for r in batch], [r.seq for r in batch],
                        [r.qual for r in batch], n_processed=n_processed)
                else:
                    lines = aligner.align_batch(
                        [r.name for r in batch], [r.seq for r in batch],
                        [r.qual for r in batch], n_processed=n_processed)
            out_q.put(lines)
            n_processed += len(batch)
            print(f"[bwamem-tpu] processed {n_processed} reads...",
                  file=sys.stderr)
    finally:
        out_q.put(_STOP)
        wt.join()
        rt.join(timeout=1.0)
    if errors:
        raise errors[0]
    return n_processed
