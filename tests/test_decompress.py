"""Decompression-shim failure contract and format coverage.

Reference: extension->filter table Common/Uncompress.cpp:32-53; SIGCHLD
fail-fast reaper Common/SignalHandler.cpp:32-62 (any decompressor child
exiting non-zero aborts the whole run with a message, exit 1)."""

import gzip
import shutil
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from ntcard_tpu.io.decompress import DecompressError, filter_command, open_input
from ntcard_tpu.io.packing import StreamPacker
from ntcard_tpu.io.readers import records_from_stream
from ntcard_tpu.pipeline import batches_from_files

DATA = Path(__file__).parent / "data"

FQ = b"@r1\nACGTACGTACGTACGT\n+\nIIIIIIIIIIIIIIII\n@r2\nTTTTACGTACGTACGT\n+\nIIIIIIIIIIIIIIII\n"


def _records(path):
    with open_input(str(path)) as f:
        return list(records_from_stream(f, str(path)))


def test_corrupt_gz_exits_1(tmp_path):
    """A decompressor child dying mid-stream must abort with exit 1 (the
    SIGCHLD fail-fast contract), not silently truncate."""
    bad = tmp_path / "corrupt.fq.gz"
    payload = gzip.compress(FQ * 500)
    bad.write_bytes(payload[: len(payload) // 2])  # truncated -> gunzip fails
    with pytest.raises(SystemExit) as e:
        list(batches_from_files([str(bad)], 256, 128, 16))
    assert e.value.code == 1


def test_missing_filter_program_exits_1(tmp_path, capsys):
    """An input whose filter program is absent must fail fast with a clean
    message + exit 1, not an unhandled traceback (Uncompress fail-fast)."""
    fake = tmp_path / "reads.fq.definitely_no_such_tool"
    # splice a fake extension into the table for a hermetic test
    from ntcard_tpu.io import decompress

    entry = (".definitely_no_such_tool", ["no-such-decompressor-xyz", "-c"])
    decompress._ZCAT_TABLE.append(entry)
    try:
        fake.write_bytes(FQ)
        with pytest.raises(SystemExit) as e:
            list(batches_from_files([str(fake)], 256, 128, 16))
        assert e.value.code == 1
        assert "no-such-decompressor-xyz" in capsys.readouterr().err
        # nthll's skip contract: silently skipped instead
        out = list(
            batches_from_files([str(fake)], 256, 128, 16, lenient=True, on_error="skip")
        )
        assert isinstance(out, list)
    finally:
        decompress._ZCAT_TABLE.remove(entry)


def test_open_missing_file_message(tmp_path, capsys):
    with pytest.raises(SystemExit) as e:
        list(batches_from_files([str(tmp_path / "nope.fq")], 256, 128, 16))
    assert e.value.code == 1
    assert "Error in reading file" in capsys.readouterr().err


@pytest.mark.parametrize(
    "ext,compressor",
    [
        (".gz", ["gzip", "-c"]),
        (".bz2", ["bzip2", "-c"]),
        (".xz", ["xz", "-c"]),
    ],
)
def test_compressed_roundtrip(tmp_path, ext, compressor):
    """Each table row whose tool exists must decode to the identical record
    stream as the plain file."""
    cmd = filter_command("x" + ext)
    if shutil.which(compressor[0]) is None or shutil.which(cmd[0]) is None:
        pytest.skip(f"{compressor[0]} or {cmd[0]} not installed")
    plain = tmp_path / "reads.fq"
    plain.write_bytes(FQ)
    comp = tmp_path / ("reads.fq" + ext)
    comp.write_bytes(subprocess.run(compressor, input=FQ, capture_output=True, check=True).stdout)
    assert _records(comp) == _records(plain)


def test_zip_roundtrip(tmp_path):
    if shutil.which("zip") is None or shutil.which("unzip") is None:
        pytest.skip("zip/unzip not installed")
    plain = tmp_path / "reads.fq"
    plain.write_bytes(FQ)
    comp = tmp_path / "reads.fq.zip"
    subprocess.run(
        ["zip", "-q", "-j", str(comp), str(plain)], check=True, capture_output=True
    )
    assert _records(comp) == _records(plain)


def test_bam_roundtrip(tmp_path):
    """.bam -> `samtools view -h` must parse as SAM-with-header."""
    if shutil.which("samtools") is None:
        pytest.skip("samtools not installed")
    sam = tmp_path / "r.sam"
    sam.write_bytes(
        b"@HD\tVN:1.6\n@SQ\tSN:c\tLN:100\n"
        b"r1\t0\tc\t1\t60\t16M\t*\t0\t0\tACGTACGTACGTACGT\tIIIIIIIIIIIIIIII\n"
    )
    bam = tmp_path / "r.bam"
    subprocess.run(
        ["samtools", "view", "-b", "-o", str(bam), str(sam)], check=True, capture_output=True
    )
    assert _records(bam) == [b"ACGTACGTACGTACGT"]
