"""Native FASTX scanner vs the Python parser (reference data-loader
equivalent: src/kseq.h / src/bwa.c:42 bseq_read)."""
import numpy as np
import pytest

from bwamem_tpu.io.fastx import _read_fastx_py, read_fastx
from bwamem_tpu.native import loader


@pytest.fixture(scope="module")
def lib():
    lib = loader.try_load()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_fastq_native_matches_python(tmp_path, lib):
    txt = "".join(f"@q{i}/2 c{i}\nACGTNacgt\n+\nIIIIIIIII\n"
                  for i in range(500))
    p = _write(tmp_path, "a.fq", txt)
    a = list(read_fastx(p))
    b = list(_read_fastx_py(p))
    assert len(a) == len(b) == 500
    for x, y in zip(a, b):
        assert x.name == y.name
        assert x.qual == y.qual
        assert x.comment == y.comment
        np.testing.assert_array_equal(x.seq, y.seq)
    assert a[0].name == "q0"  # /2 trimmed


def test_single_line_fasta_no_trailing_newline(tmp_path, lib):
    p = _write(tmp_path, "b.fa", ">a desc\nACGT\n>b\nGGCC")
    recs = list(read_fastx(p))
    assert [r.name for r in recs] == ["a", "b"]
    np.testing.assert_array_equal(recs[1].seq, [2, 2, 1, 1])
    assert recs[0].qual is None


def test_multiline_fasta_falls_back(tmp_path, lib):
    p = _write(tmp_path, "c.fa", ">m\nACGT\nACGT\nTT\n")
    recs = list(read_fastx(p))
    assert len(recs) == 1 and len(recs[0].seq) == 10


def test_chunk_boundary_straddle(tmp_path, lib):
    """Records crossing the native scanner's chunk boundary must survive."""
    from bwamem_tpu.io.fastx import _read_fastx_native

    txt = "".join(f"@q{i}\n{'ACGT' * 30}\n+\n{'I' * 120}\n"
                  for i in range(200))
    p = _write(tmp_path, "d.fq", txt)
    for chunk in (97, 255, 1024):  # force boundaries mid-record
        recs = list(_read_fastx_native(lib, p, chunk=chunk))
        assert len(recs) == 200, chunk
        assert all(len(r.seq) == 120 for r in recs)
        assert recs[199].name == "q199"


def test_gzip_transparent(tmp_path):
    """Gzipped FASTQ parses identically to plain (reference reads gz via
    kseq+zlib, src/kseq.h); truncated gz fails loudly, not silently."""
    import gzip

    import numpy as np
    import pytest

    from bwamem_tpu.io.fastx import read_fastx

    plain = tmp_path / "a.fq"
    plain.write_text("@r1 c1\nACGTN\n+\nIIIII\n@r2/1\nggcc\n+\nJJJJ\n")
    gz = tmp_path / "a.fq.gz"
    gz.write_bytes(gzip.compress(plain.read_bytes()))
    a = list(read_fastx(str(plain)))
    b = list(read_fastx(str(gz)))
    assert len(a) == len(b) == 2
    for x, y in zip(a, b):
        assert x.name == y.name and x.qual == y.qual \
            and x.comment == y.comment
        assert np.array_equal(x.seq, y.seq)
    trunc = tmp_path / "t.fq.gz"
    trunc.write_bytes(gz.read_bytes()[:20])
    with pytest.raises(Exception):
        list(read_fastx(str(trunc)))
