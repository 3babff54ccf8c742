"""2-bit read upload packing roundtrip (ops/readpack)."""
import jax.numpy as jnp
import numpy as np

from bwamem_tpu.ops.readpack import pack_reads_host, unpack_reads


def test_roundtrip_with_ns_and_padding():
    rng = np.random.default_rng(3)
    B, L = 37, 96
    reads = np.full((B, L), 4, np.int8)
    lens = np.zeros(B, np.int32)
    for i in range(B):
        n = int(rng.integers(0, L + 1))
        reads[i, :n] = rng.integers(0, 4, n)
        if n and i % 3 == 0:  # in-read Ns
            reads[i, rng.integers(0, n)] = 4
        lens[i] = n
    words, npos, ok = pack_reads_host(reads, lens)
    assert ok
    out = np.asarray(unpack_reads(jnp.asarray(words), jnp.asarray(lens),
                                  jnp.asarray(npos), L))
    np.testing.assert_array_equal(out, reads)


def test_overflow_falls_back():
    reads = np.full((64, 96), 4, np.int8)
    lens = np.full(64, 96, np.int32)   # all-N IN-READ overflows
    words, npos, ok = pack_reads_host(reads, lens)
    assert not ok  # 6144 in-read Ns > N_CAP


def test_padding_not_exceptions():
    """Product shapes: heavy padding must not overflow the N list."""
    reads = np.full((16384, 160), 4, np.int8)
    lens = np.full(16384, 150, np.int32)
    reads[:, :150] = 1
    reads[7, 3] = 4  # one real in-read N
    words, npos, ok = pack_reads_host(reads, lens)
    assert ok and int((npos >= 0).sum()) == 1
    import jax.numpy as jnp
    from bwamem_tpu.ops.readpack import unpack_reads
    out = np.asarray(unpack_reads(jnp.asarray(words), jnp.asarray(lens),
                                  jnp.asarray(npos), 160))
    np.testing.assert_array_equal(out, reads)


def test_aligner_path_unchanged():
    """Seeding through the packed upload emits identical seeds."""
    from tests.conftest import make_genome
    from bwamem_tpu.index.build import build_index_from_codes
    from bwamem_tpu.index.format import Annotation
    from bwamem_tpu.pipeline.aligner import MemAligner
    from bwamem_tpu.pipeline.options import MemOptions

    rng = np.random.default_rng(9)
    g = make_genome(rng, 6000)
    ann = Annotation(names=["c"], lengths=[6000], offsets=[0])
    idx = build_index_from_codes(g, ann, sa_intv=8)
    seqs = []
    for i in range(12):
        p = int(rng.integers(0, 6000 - 90))
        r = g[p : p + 90].copy()
        if i % 4 == 0:
            r[int(rng.integers(0, 90))] = 4
        seqs.append(r)
    al = MemAligner(MemOptions(), idx)
    sam = al.align_batch([f"r{i}" for i in range(12)], seqs)
    assert sum(1 for ln in sam if ln and not ln.startswith("@")) >= 12
