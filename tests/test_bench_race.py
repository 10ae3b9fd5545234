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


def test_city64_matches_reference(tmp_path):
    if not shutil.which("g++"):
        pytest.skip("g++ unavailable")
    from ntcard_tpu.bench.__main__ import _city64

    src = tmp_path / "ch.cpp"
    src.write_text(
        '#include "city.h"\n#include <cstdio>\n#include <cstring>\n'
        "int main(int argc, char** argv) {\n"
        "  for (int i = 1; i < argc; i++)\n"
        '    printf("%llu\\n", (unsigned long long)CityHash64(argv[i], strlen(argv[i])));\n'
        "  return 0;\n}\n"
    )
    exe = tmp_path / "ch"
    r = subprocess.run(
        ["g++", "-O2", "-I/root/reference/vendor/ntHash/lib", "-o", str(exe),
         str(src), "/root/reference/vendor/ntHash/lib/city.cc"],
        capture_output=True,
    )
    if r.returncode != 0:
        pytest.skip(f"reference city does not compile: {r.stderr.decode()[:200]}")
    rng = np.random.default_rng(11)
    # one k per branch: 1-3 (byte path), 4-8 (u32), 9-16 (u64 pair),
    # 17-32, 33-64, then >64 with 1 and 2+tail 64-byte loop iterations
    for k in (3, 7, 12, 20, 33, 50, 64, 65, 100, 128, 200):
        kmers = [bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), size=k)) for _ in range(16)]
        out = subprocess.run(
            [str(exe)] + [s.decode() for s in kmers], capture_output=True, check=True
        )
        want = [int(x) for x in out.stdout.split()]
        wins = np.stack([np.frombuffer(s, np.uint8) for s in kmers])
        got = [int(v) for v in _city64(wins)]
        assert got == want, f"k={k}"


def test_xxh64_matches_reference(tmp_path):
    if not shutil.which("g++"):
        pytest.skip("g++ unavailable")
    from ntcard_tpu.bench.__main__ import _xxh64

    src = tmp_path / "xx.c"
    src.write_text(
        '#include "xxhash.h"\n#include <stdio.h>\n#include <string.h>\n'
        "int main(int argc, char** argv) {\n"
        "  for (int i = 1; i < argc; i++)\n"
        '    printf("%llu\\n", (unsigned long long)XXH64(argv[i], strlen(argv[i]), 0));\n'
        "  return 0;\n}\n"
    )
    exe = tmp_path / "xx"
    r = subprocess.run(
        ["gcc", "-O2", "-I/root/reference/vendor/ntHash/lib", "-o", str(exe),
         str(src), "/root/reference/vendor/ntHash/lib/xxhash.c"],
        capture_output=True,
    )
    if r.returncode != 0:
        pytest.skip(f"reference xxhash does not compile: {r.stderr.decode()[:200]}")
    rng = np.random.default_rng(6)
    # k=64 (4-lane path, no tail) and k=40 (lanes + 8-byte tail chunks)
    for k in (64, 40):
        kmers = [bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), size=k)) for _ in range(16)]
        out = subprocess.run(
            [str(exe)] + [s.decode() for s in kmers], capture_output=True, check=True
        )
        want = [int(x) for x in out.stdout.split()]
        wins = np.stack([np.frombuffer(s, np.uint8) for s in kmers])
        got = [int(v) for v in _xxh64(wins)]
        assert got == want, f"k={k}"
