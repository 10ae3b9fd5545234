"""Randomized end-to-end parity vs the reference binary (tools/fuzz_parity).

Each case: random records/format/container + random flag set, byte-diffed
against a locally built reference ntcard. Alternates single-device (quad
wire) and 8-virtual-device (sharded) runs. A handful of seeds here; the
standalone tool runs arbitrarily many."""

import shutil
import tempfile
from pathlib import Path

import pytest

from tools.fuzz_parity import build_reference, run_case, run_case_nthll

REF = Path("/tmp/ntcard_bench/ntcard_ref")
REF_HLL = Path("/tmp/ntcard_bench/nthll_ref")


@pytest.fixture(scope="module")
def ref_exe():
    if not build_reference(REF):
        pytest.skip("reference binary unavailable")
    return REF


@pytest.mark.parametrize("seed", [101, 102, 103, 104])
def test_fuzz_case(ref_exe, seed):
    work = Path(tempfile.mkdtemp(prefix="ntcard_fuzz_test_"))
    try:
        msg = run_case(seed, ref_exe, work)
        assert msg is None, msg
    finally:
        shutil.rmtree(work, ignore_errors=True)


@pytest.mark.parametrize("seed", [201, 202])
def test_fuzz_nthll_case(seed):
    if not build_reference(REF_HLL, "nthll.cpp"):
        pytest.skip("reference nthll unavailable")
    work = Path(tempfile.mkdtemp(prefix="ntcard_fuzz_hll_"))
    try:
        msg = run_case_nthll(seed, REF_HLL, work)
        assert msg is None, msg
    finally:
        shutil.rmtree(work, ignore_errors=True)
