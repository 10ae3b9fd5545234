"""The >=50 GB sizing branch: a custom ``-s`` is silently overridden to 7
for inputs under 50 GB (ntcard.cpp:427-431 — the override runs AFTER
parsing), and honored at or above it. The small-input side is covered by
every golden; this file covers the HONORED side against the real reference
binary without 50 GB of disk: the reference sizes inputs via an
ate-open + tellg (ntcard.cpp:89-94), i.e. an lseek(SEEK_END), so a tiny
LD_PRELOAD shim makes the marker file report 50 GB while the actual stream
stays small; our CLI's equivalent (io.decompress.input_size) is
monkeypatched the same way. Outputs must be byte-identical."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

from ntcard_tpu import cli

REPO = Path(__file__).resolve().parents[1]
REF_EXE = Path("/tmp/ntcard_bench/ntcard_ref")

_SHIM_SRC = r"""
#define _GNU_SOURCE
#include <dlfcn.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <unistd.h>

/* Fake st-size for files whose path contains $FAKESIZE_MARKER: SEEK_END
   returns $FAKESIZE, and a following tellg's lseek(0, SEEK_CUR) on the
   same (still-matching) fd reports the same — exactly the call pattern of
   the reference's getInf (ifstream ate-open + tellg). All other I/O is
   untouched, so the actual byte stream read is the real small file. */

static long long fake_size(void) {
  const char *v = getenv("FAKESIZE");
  return v ? atoll(v) : 0;
}

static int fd_matches(int fd) {
  const char *marker = getenv("FAKESIZE_MARKER");
  char lnk[64], path[4096];
  ssize_t n;
  if (!marker || !*marker)
    return 0;
  snprintf(lnk, sizeof lnk, "/proc/self/fd/%d", fd);
  n = readlink(lnk, path, sizeof path - 1);
  if (n <= 0)
    return 0;
  path[n] = 0;
  return strstr(path, marker) != NULL;
}

static off_t shim_lseek(int fd, off_t off, int whence, const char *sym) {
  static off_t (*real64)(int, off_t, int) = 0;
  if (!real64)
    real64 = (off_t(*)(int, off_t, int))dlsym(RTLD_NEXT, "lseek64");
  off_t r = real64(fd, off, whence);
  (void)sym;
  if ((whence == SEEK_END || (whence == SEEK_CUR && off == 0)) &&
      fd_matches(fd)) {
    long long fake = fake_size();
    if (fake > 0) {
      if (whence == SEEK_END)
        return (off_t)fake + off;
      /* tellg right after the ate-open's SEEK_END */
      if (r == real64(fd, 0, SEEK_END))
        return (off_t)fake;
    }
  }
  return r;
}

off_t lseek64(int fd, off_t off, int whence) {
  return shim_lseek(fd, off, whence, "lseek64");
}

off_t lseek(int fd, off_t off, int whence) {
  return shim_lseek(fd, off, whence, "lseek");
}
"""


def _build_ref(tmp: Path) -> Path | None:
    sys.path.insert(0, str(REPO / "tools"))
    from fuzz_parity import build_reference

    REF_EXE.parent.mkdir(parents=True, exist_ok=True)
    return REF_EXE if build_reference(REF_EXE) else None


def _build_shim(tmp: Path) -> Path | None:
    import shutil

    if not shutil.which("g++"):
        return None
    src = tmp / "fakesize.c"
    so = tmp / "fakesize.so"
    src.write_text(_SHIM_SRC)
    r = subprocess.run(
        ["g++", "-shared", "-fPIC", "-O2", "-o", str(so), str(src), "-ldl"],
        capture_output=True,
    )
    return so if r.returncode == 0 else None


def _write_fastq(path: Path, n_reads: int = 3000) -> None:
    import random

    rng = random.Random(99)
    with open(path, "w") as f:
        for i in range(n_reads):
            seq = "".join(rng.choice("ACGT") for _ in range(120))
            f.write(f"@r{i}\n{seq}\n+\n{'I' * 120}\n")


@pytest.mark.parametrize("sflag", ["9", "10"])
def test_custom_sbits_honored_at_50gb(tmp_path, monkeypatch, sflag):
    ref = _build_ref(tmp_path)
    shim = _build_shim(tmp_path)
    if ref is None or shim is None:
        pytest.skip("reference binary or g++ unavailable")
    fq = tmp_path / "bigfile_reads.fq"  # "bigfile" = the shim's marker
    _write_fastq(fq)

    env = dict(
        os.environ,
        LD_PRELOAD=str(shim),
        FAKESIZE="50000000000",
        FAKESIZE_MARKER="bigfile",
    )
    # sanity: WITHOUT the marker env the same shim build leaves sizing
    # alone and -s is overridden to 7 (equals a plain run)
    r = subprocess.run(
        [str(ref), "-k12", f"-s{sflag}", "-c40", "-p", str(tmp_path / "refbig"),
         str(fq)],
        capture_output=True, env=env, timeout=120,
    )
    assert r.returncode == 0, r.stderr.decode()[-500:]
    ref_big = (tmp_path / "refbig_k12.hist").read_bytes()

    r2 = subprocess.run(
        [str(ref), "-k12", f"-s{sflag}", "-c40", "-p", str(tmp_path / "refsmall"),
         str(fq)],
        capture_output=True, timeout=120,
    )
    assert r2.returncode == 0
    ref_small = (tmp_path / "refsmall_k12.hist").read_bytes()
    # the honored -s must actually change the estimate (else the shim
    # silently failed and this test proves nothing)
    assert ref_big != ref_small, "shim did not take: -s was still overridden"

    # ours: same fake via the sizing function our CLI uses
    from ntcard_tpu.io import decompress

    real_input_size = decompress.input_size
    monkeypatch.setattr(
        decompress,
        "input_size",
        lambda p: 50_000_000_000 if "bigfile" in str(p) else real_input_size(p),
    )
    monkeypatch.setenv("NTCARD_DAEMON", "0")
    assert cli.main(
        ["-k12", f"-s{sflag}", "-c40", "-p", str(tmp_path / "oursbig"), str(fq)]
    ) == 0
    assert (tmp_path / "oursbig_k12.hist").read_bytes() == ref_big

    # and the under-50GB side through the same flags (override to 7)
    monkeypatch.setattr(decompress, "input_size", real_input_size)
    assert cli.main(
        ["-k12", f"-s{sflag}", "-c40", "-p", str(tmp_path / "ourssmall"), str(fq)]
    ) == 0
    assert (tmp_path / "ourssmall_k12.hist").read_bytes() == ref_small
