"""The bench race mode's competitor hashes must actually be the hashes they
claim to be (racing a broken hash would be a meaningless comparison):
murmur2-64A is checked against the reference's vendored implementation
(vendor/ntHash/lib/murmur.hpp), FNV-1a 64 against published test vectors.
"""

import shutil
import subprocess

import numpy as np
import pytest

from ntcard_tpu.bench.__main__ import _fnv1a64, _murmur64a


def test_fnv1a64_vectors():
    # published FNV-1a 64 vectors need per-length hashing; our racer fixes
    # k per call, so check single inputs of various k (multiple of 1 byte)
    vecs = {
        b"a": 0xAF63DC4C8601EC8C,
        b"foobar": 0x85944171F73967E8,
    }
    for s, want in vecs.items():
        w = np.frombuffer(s, np.uint8)[None, :]
        assert int(_fnv1a64(w)[0]) == want


def test_murmur64a_matches_reference(tmp_path):
    if not shutil.which("g++"):
        pytest.skip("g++ unavailable")
    src = tmp_path / "mm.cpp"
    src.write_text(
        '#include "murmur.hpp"\n#include <cstdio>\n#include <cstring>\n'
        "int main(int argc, char** argv) {\n"
        "  for (int i = 1; i < argc; i++)\n"
        '    printf("%llu\\n", (unsigned long long)MurmurHash64A(argv[i], strlen(argv[i]), 0));\n'
        "  return 0;\n}\n"
    )
    exe = tmp_path / "mm"
    r = subprocess.run(
        ["g++", "-O2", "-I/root/reference/vendor/ntHash/lib", "-o", str(exe), str(src)],
        capture_output=True,
    )
    if r.returncode != 0:
        pytest.skip(f"reference murmur does not compile: {r.stderr.decode()[:200]}")
    rng = np.random.default_rng(4)
    kmers = [bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), size=64)) for _ in range(16)]
    out = subprocess.run(
        [str(exe)] + [k.decode() for k in kmers], capture_output=True, check=True
    )
    want = [int(x) for x in out.stdout.split()]
    wins = np.stack([np.frombuffer(k, np.uint8) for k in kmers])
    got = [int(v) for v in _murmur64a(wins)]
    assert got == want
