"""Multi-chip sharding on the virtual 8-device CPU mesh."""
import jax
import numpy as np
import pytest

from bwamem_tpu.index.build import build_index_from_codes
from bwamem_tpu.index.format import Annotation
from bwamem_tpu.index.device import DeviceFMIndex
from bwamem_tpu.models.mem import AlignStepConfig, device_align_step
from bwamem_tpu.ops.seeding import SeedConfig
from bwamem_tpu.parallel.sharded import (make_mesh, replicate_index,
                                         shard_reads, sharded_align_step)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(11)
    g = rng.integers(0, 4, 8000, dtype=np.uint8)
    ann = Annotation(names=["c"], lengths=[8000], offsets=[0])
    idx = build_index_from_codes(g, ann, sa_intv=8)
    fm = DeviceFMIndex.from_host(idx)
    B, L = 16, 80
    reads = np.full((B, L), 4, np.int32)
    lens = np.full(B, L, np.int32)
    truth = []
    for i in range(B):
        pos = int(rng.integers(0, 8000 - L))
        reads[i] = g[pos : pos + L]
        truth.append(pos)
    return fm, reads, lens, truth


def test_single_device_step(setup):
    fm, reads, lens, truth = setup
    import jax.numpy as jnp

    out = device_align_step(fm, jnp.asarray(reads), jnp.asarray(lens))
    out = {k: np.asarray(v) for k, v in out.items()}
    # exact reads: full-length alignment at the true position
    assert (out["score"] == 80).all()
    np.testing.assert_array_equal(out["rb"], np.asarray(truth))
    np.testing.assert_array_equal(out["qb"], 0)
    np.testing.assert_array_equal(out["qe"], 80)


def test_sharded_matches_single(setup):
    fm, reads, lens, truth = setup
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    mesh = make_mesh(8)
    fm_r = replicate_index(mesh, fm)
    r_sh, l_sh, B = shard_reads(mesh, reads, lens)
    step = sharded_align_step(mesh)
    out, total_seeds = step(fm_r, r_sh, l_sh)
    out = {k: np.asarray(v)[:B] for k, v in out.items()}

    import jax.numpy as jnp
    ref = device_align_step(fm, jnp.asarray(reads), jnp.asarray(lens))
    ref = {k: np.asarray(v) for k, v in ref.items()}
    for k in ("score", "qb", "qe", "rb", "re"):
        np.testing.assert_array_equal(out[k], ref[k], err_msg=k)
    assert int(total_seeds) == int(ref["n_seeds"].sum())


def test_full_pipeline_sharded_matches_single():
    """The COMPLETE aligner (seeding + chaining + extension + SAM) over an
    8-device mesh must emit identical SAM lines to single-device."""
    from bwamem_tpu.index.build import build_index_from_codes
    from bwamem_tpu.index.format import Annotation
    from bwamem_tpu.pipeline.aligner import MemAligner
    from bwamem_tpu.pipeline.options import MemOptions

    rng = np.random.default_rng(17)
    g = rng.integers(0, 4, 20000, dtype=np.uint8)
    ann = Annotation(names=["c"], lengths=[20000], offsets=[0])
    idx = build_index_from_codes(g, ann, sa_intv=8)
    names, seqs = [], []
    for i in range(30):
        p = int(rng.integers(0, 20000 - 120))
        r = g[p : p + 120].copy()
        r[int(rng.integers(0, 120))] ^= 1
        if i % 2:
            r = (3 - r)[::-1]
        names.append(f"m{i}")
        seqs.append(r)
    single = MemAligner(MemOptions(), idx).align_batch(names, seqs)
    mesh = make_mesh(8)
    multi = MemAligner(MemOptions(), idx, mesh=mesh).align_batch(names, seqs)
    assert single == multi


def test_full_pipeline_pe_sharded_matches_single():
    """PAIRED-END through the mesh: the complete PE flow (collect +
    pestat + batched mate rescue + pairing + PE SAM) over 8 devices must
    emit identical SAM lines to single-device (the SE-only variant above
    left rescue/pairing unexercised across shard_map)."""
    from bwamem_tpu.index.build import build_index_from_codes
    from bwamem_tpu.index.format import Annotation
    from bwamem_tpu.pipeline.aligner import MemAligner
    from bwamem_tpu.pipeline.options import MemOptions

    rng = np.random.default_rng(23)
    g = rng.integers(0, 4, 40000, dtype=np.uint8)
    ann = Annotation(names=["c"], lengths=[40000], offsets=[0])
    idx = build_index_from_codes(g, ann, sa_intv=8)
    names, seqs = [], []
    for i in range(40):
        isize = 240 + int(rng.integers(0, 80))
        p = int(rng.integers(0, 40000 - isize - 1))
        frag = g[p : p + isize]
        a = frag[:100].copy()
        b = (3 - frag[-100:])[::-1].copy()
        for r in (a, b):
            r[int(rng.integers(0, 100))] ^= 1
        # a few pairs with a shattered mate so rescue has work to do
        if i % 7 == 0:
            b = rng.integers(0, 4, 100, dtype=b.dtype)
        names += [f"p{i}", f"p{i}"]
        seqs += [a, b]
    single = MemAligner(MemOptions(), idx).align_pairs_batch(names, seqs)
    mesh = make_mesh(8)
    multi = MemAligner(MemOptions(), idx,
                       mesh=mesh).align_pairs_batch(names, seqs)
    assert single == multi
