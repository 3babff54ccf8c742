"""Static-shape quantization for device launches.

XLA compiles one executable per shape; unbucketed padding recompiles on
almost every batch (the dominant cost in early profiles). All device entry
points round their padded dims to this geometric grid so steady state
reuses a small, finite set of executables. The reference gets the same
effect from fixed compile-time capacities (SEQ_BATCH_SIZE=5000,
MAX_SEQ_LEN, reference: src/bwamem.c:57, GASAL2 README step 3).
"""
from __future__ import annotations


def bucket_len(n: int, minimum: int = 16) -> int:
    """Round a sequence-length dim up to the {2^k, 1.5*2^k} grid."""
    n = max(int(n), minimum)
    p = minimum
    while True:
        if n <= p:
            return p
        if n <= p + (p >> 1):
            return p + (p >> 1)
        p <<= 1


def bucket_count(n: int, minimum: int = 16) -> int:
    """Round a batch dim up to the {2^k, 1.5*2^k} grid (padding lanes are
    masked dead; ~17% worst-case waste beats a recompile)."""
    return bucket_len(n, minimum)
