"""models/bloom.BloomFilter — the ntHash multi-hash consumer surface
(reference vendor/ntHash/lib/BloomFilter.hpp + nttest FPR sweeps)."""

import numpy as np
import pytest

from ntcard_tpu.io.packing import aligned_stride, pack_records
from ntcard_tpu.models.bloom import BloomFilter

CHUNK, K = 192, 25
STRIDE = aligned_stride(CHUNK, K)


def _batches(records):
    return list(pack_records(records, CHUNK, 128, K))


def test_no_false_negatives_and_fpr():
    rng = np.random.default_rng(5)
    alphabet = np.frombuffer(b"ACGT", np.uint8)
    ins = [bytes(rng.choice(alphabet, size=300)) for _ in range(40)]
    absent = [bytes(rng.choice(alphabet, size=300)) for _ in range(40)]

    bf = BloomFilter(K, m_bits=18, n_hashes=3)
    n = sum(bf.insert_batch(b, STRIDE) for b in _batches(ins))
    assert n == bf.n_inserted > 5000

    # every inserted k-mer must be found (no false negatives)
    for b in _batches(ins):
        present, valid = bf.contains_batch(b, STRIDE)
        np.testing.assert_array_equal(present[valid], True)

    # absent k-mers: FPR within a loose band of theory
    fp = tot = 0
    for b in _batches(absent):
        present, valid = bf.contains_batch(b, STRIDE)
        fp += int(present[valid].sum())
        tot += int(valid.sum())
    theo = bf.fpr_theory()
    assert 0 < theo < 0.2
    assert fp / tot < 4 * theo + 0.01


def test_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(6)
    alphabet = np.frombuffer(b"ACGT", np.uint8)
    recs = [bytes(rng.choice(alphabet, size=280)) for _ in range(10)]
    bf = BloomFilter(K, m_bits=14, n_hashes=2)
    for b in _batches(recs):
        bf.insert_batch(b, STRIDE)
    p = str(tmp_path / "bf.npz")
    bf.save(p)
    bf2 = BloomFilter.load(p)
    assert bf2.n_inserted == bf.n_inserted
    for b in _batches(recs):
        a, _ = bf.contains_batch(b, STRIDE)
        c, _ = bf2.contains_batch(b, STRIDE)
        np.testing.assert_array_equal(a, c)


def test_validation():
    with pytest.raises(ValueError):
        BloomFilter(25, m_bits=31)
    with pytest.raises(ValueError):
        BloomFilter(25, m_bits=16, n_hashes=0)


def test_raw_format_interop_with_reference(tmp_path):
    """store_raw must be BYTE-IDENTICAL to the reference BloomFilter's
    storeFilter (BloomFilter.hpp:260-264) for the same canonical k-mer
    inserts at power-of-two m: compile a tiny driver against the vendored
    header, insert the same k-mers on both sides, diff the files."""
    import shutil
    import subprocess

    if not shutil.which("g++"):
        pytest.skip("g++ unavailable")
    rng = np.random.default_rng(11)
    alphabet = np.frombuffer(b"ACGT", np.uint8)
    m_bits, n_hashes = 14, 3
    kmers = [bytes(rng.choice(alphabet, size=K)) for _ in range(200)]
    src = tmp_path / "bf_driver.cpp"
    src.write_text(
        '#include "BloomFilter.hpp"\n'
        "#include <fstream>\n#include <string>\n"
        "int main(int argc, char** argv) {\n"
        f"  BloomFilter bf((size_t)1 << {m_bits}, {n_hashes}, {K});\n"
        "  std::ifstream in(argv[1]);\n  std::string s;\n"
        "  while (std::getline(in, s)) bf.insert(s.c_str());\n"
        "  bf.storeFilter(argv[2]);\n  return 0;\n}\n"
    )
    exe = tmp_path / "bf_driver"
    r = subprocess.run(
        ["g++", "-O2", "-I/root/reference/vendor/ntHash",
         "-I/root/reference/vendor/ntHash/lib", "-o", str(exe), str(src)],
        capture_output=True,
    )
    if r.returncode != 0:
        pytest.skip(f"reference BloomFilter does not compile: {r.stderr.decode()[:200]}")
    kfile = tmp_path / "kmers.txt"
    kfile.write_bytes(b"\n".join(kmers) + b"\n")
    ref_out = tmp_path / "ref.bf"
    subprocess.run([str(exe), str(kfile), str(ref_out)], check=True)

    bf = BloomFilter(K, m_bits=m_bits, n_hashes=n_hashes)
    for b in _batches(kmers):  # len-K records: exactly one window each
        bf.insert_batch(b, STRIDE)
    ours = tmp_path / "ours.bf"
    bf.store_raw(str(ours))
    assert ours.read_bytes() == ref_out.read_bytes()
    # and the loader inverts it
    bf2 = BloomFilter.load_raw(str(ours), K, m_bits, n_hashes)
    np.testing.assert_array_equal(np.asarray(bf2.slots), np.asarray(bf.slots))
