"""The native C++ decode+pack layer must produce byte-identical batch
streams to the pure-Python readers+packer path, across formats and edge
cases."""

import gzip
import shutil

import numpy as np
import pytest

from ntcard_tpu.io.decompress import open_input
from ntcard_tpu.io.packing import StreamPacker
from ntcard_tpu.io.readers import records_from_stream
from ntcard_tpu.native import get_lib, native_batches_from_files

from pathlib import Path

DATA = Path(__file__).parent / "data"

pytestmark = pytest.mark.skipif(get_lib() is None, reason="no native toolchain")

CHUNK, ROWS, KMAX = 256, 128, 32


def python_batches(paths, lenient=False):
    packer = StreamPacker(CHUNK, ROWS, KMAX)
    out = []
    for path in paths:
        with open_input(str(path)) as f:
            for rec in records_from_stream(f, str(path), lenient=lenient):
                out.extend(packer.feed(rec))
    out.extend(packer.finish())
    return out


def native_batches(paths, lenient=False):
    return list(
        native_batches_from_files([str(p) for p in paths], CHUNK, ROWS, KMAX, lenient)
    )


@pytest.mark.parametrize("src", ["reads.fq", "reads-rna.fq", "reads.fa", "reads.sam", "contig.fa"])
def test_formats_match_python(src):
    want = python_batches([DATA / src])
    got = native_batches([DATA / src])
    assert len(got) == len(want)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)


def test_multi_file_match(tmp_path):
    paths = [DATA / "reads.fq", DATA / "contig.fa", DATA / "reads.sam"]
    want = python_batches(paths)
    got = native_batches(paths)
    assert len(got) == len(want)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)


def test_gzip_input(tmp_path):
    gz = tmp_path / "reads.fq.gz"
    with open(DATA / "reads.fq", "rb") as src, gzip.open(gz, "wb") as dst:
        shutil.copyfileobj(src, dst)
    want = python_batches([DATA / "reads.fq"])
    got = native_batches([gz])
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)


def test_edge_cases(tmp_path):
    # no trailing newline, CR retention, empty records, short reads, N runs
    fq = tmp_path / "edge.fq"
    fq.write_bytes(
        b"@r1\nACGTNNACGT\r\n+\nIIIIIIIIII\n"
        b"@r2\n\n+\n\n"
        b"@r3\nACG\n+\nIII"  # no trailing newline: qual line still read
    )
    fa = tmp_path / "edge.fa"
    fa.write_bytes(b">a\nACGT\nACGT\n>b\n>c\nNNN")
    for p in (fq, fa):
        want = python_batches([p])
        got = native_batches([p])
        assert len(got) == len(want)
        for a, b in zip(got, want):
            np.testing.assert_array_equal(a, b)


def test_truncated_fastq_drops_partial(tmp_path):
    fq = tmp_path / "trunc.fq"
    fq.write_bytes(b"@r1\nACGTACGT\n+\nIIIIIIII\n@r2\nACGTACGT\n+\n")  # qual missing
    want = python_batches([fq])
    got = native_batches([fq])
    assert len(got) == len(want)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)


def test_sam_short_line_persistence(tmp_path):
    sam = tmp_path / "p.sam"
    sam.write_bytes(
        b"@HD\tVN:1.6\n"
        b"r1\t0\tc\t1\t60\t*\t*\t0\t0\tACGTACGT\tIIIIIIII\n"
        b"r2\t0\tc\n"  # short line: SEQ inherits previous ACGTACGT
    )
    want = python_batches([sam])
    got = native_batches([sam])
    assert len(got) == len(want)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)


def test_sam_midfile_at_line_is_alignment(tmp_path):
    # getEsm (ntcard.cpp:220-224) skips only the LEADING header: a stray
    # mid-file '@' line is parsed as an alignment whose missing fields
    # inherit the previous line's values (reference-verified: such a file
    # yields records [SEQ1, SEQ1, SEQ2], F1=15 at k=12 for 16 bp seqs).
    sam = tmp_path / "mid.sam"
    sam.write_bytes(
        b"@HD\tVN:1.6\n"
        b"r1\t0\tc\t1\t60\t*\t*\t0\t0\tACGTACGTACGTACGT\tIIII\n"
        b"@CO\tstray comment\n"
        b"r2\t0\tc\t1\t60\t*\t*\t0\t0\tTTTTTTTTTTTTTTTT\tIIII\n"
    )
    want = python_batches([sam])
    got = native_batches([sam])
    assert len(got) == len(want)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)
    # and the stream contains three records (the '@CO' one repeats SEQ1)
    packer = StreamPacker(CHUNK, ROWS, KMAX)
    with open_input(str(sam)) as f:
        recs = list(records_from_stream(f, str(sam)))
    assert recs == [b"ACGTACGTACGTACGT", b"ACGTACGTACGTACGT", b"TTTTTTTTTTTTTTTT"]


def test_headerless_sam_five_fields(tmp_path):
    # getftype (ntcard.cpp:124-128) needs only fields 2 and 5 numeric;
    # istringstream leaves missing s6..s11 empty — no 11-field minimum.
    sam = tmp_path / "hless.sam"
    sam.write_bytes(
        b"r1\t0\tc\t1\t60\n"
        b"r2\t0\tc\t1\t60\t*\t*\t0\t0\tACGTACGTACGTACGT\tIIII\n"
    )
    want = python_batches([sam])
    got = native_batches([sam])
    assert len(got) == len(want)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)
    with open_input(str(sam)) as f:
        recs = list(records_from_stream(f, str(sam)))
    assert recs == [b"", b"ACGTACGTACGTACGT"]


def test_lenient_empty_file_is_silent(tmp_path):
    # nthll processes an empty file silently (its reader loop has no error
    # path); both paths must yield one empty record, not an error.
    empty = tmp_path / "empty.fq"
    empty.write_bytes(b"")
    want = python_batches([empty], lenient=True)
    got = native_batches([empty], lenient=True)
    assert len(got) == len(want)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)


def test_unknown_format_errors(tmp_path):
    bad = tmp_path / "bad.txt"
    bad.write_text("not a sequence file at all\n")
    with pytest.raises(SystemExit):
        native_batches([bad])


def test_lenient_mode_accepts_garbage(tmp_path):
    bad = tmp_path / "bad.txt"
    bad.write_text("only three fields\n")
    want = python_batches([bad], lenient=True)
    got = native_batches([bad], lenient=True)
    assert len(got) == len(want)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("src", ["reads.fq", "reads.fa", "reads.sam", "contig.fa"])
def test_wire_packed_pop_matches_pack_rows(src):
    """The C-fused nibble-packed pop must equal pack_rows() applied to the
    unpacked batch stream — the wire format is defined by io/packing.py."""
    from ntcard_tpu.io.packing import pack_rows

    unpacked = native_batches([DATA / src])
    packed = list(
        native_batches_from_files([str(DATA / src)], CHUNK, ROWS, KMAX, wire_packed=True)
    )
    assert len(packed) == len(unpacked)
    for p, u in zip(packed, unpacked):
        assert p.shape == (ROWS // 2, CHUNK)
        np.testing.assert_array_equal(p, pack_rows(u))


def test_wire_packed_small_io_chunks(tmp_path):
    """Packed pops with tiny feed chunks (line-boundary carries) must match
    one-shot pops."""
    src = DATA / "reads.fq"
    one = list(
        native_batches_from_files([str(src)], CHUNK, ROWS, KMAX, wire_packed=True)
    )
    tiny = list(
        native_batches_from_files(
            [str(src)], CHUNK, ROWS, KMAX, wire_packed=True, io_chunk=97
        )
    )
    assert len(one) == len(tiny)
    for a, b in zip(one, tiny):
        np.testing.assert_array_equal(a, b)


def test_nonascii_bytes_translate_as_n(tmp_path):
    """Sequence bytes outside ASCII (and every non-base ASCII byte) code as
    N in both paths — exercises the vectorized 128-entry LUT's high-bit
    blend (native/packer.cpp translate_codes_vbmi) against the Python
    translate table, over lines long enough to hit the 64-byte vector loop."""
    odd = bytes(range(0x20, 0x7F)).replace(b">", b"").replace(b"@", b"")
    hi = bytes(range(0x80, 0x100))
    seq = (b"ACGTacgtUu" + odd + hi + b"ACGT" * 40)
    p = tmp_path / "odd.fa"
    p.write_bytes(b">r1\n" + seq + b"\n>r2\n" + seq[::-1] + b"\n")
    want = python_batches([p])
    got = native_batches([p])
    assert len(got) == len(want)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)
