"""The batched JAX scan kernel must reproduce the scalar oracle exactly:
same multiset of canonical hashes and the same valid-window (F1) counts, for
any record mix (short reads, contigs spanning many chunks, N runs, empty and
sub-k records), across chunk/batch geometry."""

import random
from collections import Counter

import jax
import numpy as np
import pytest

from ntcard_tpu.io.packing import StreamPacker, pack_records
from ntcard_tpu.ops import nthash_ref as R
from ntcard_tpu.ops.nthash import canonical_hashes


def random_records(seed, n, alphabet="ACGTN", minlen=0, maxlen=300):
    rng = random.Random(seed)
    recs = []
    for _ in range(n):
        ln = rng.randint(minlen, maxlen)
        recs.append("".join(rng.choice(alphabet) for _ in range(ln)).encode())
    return recs


def oracle_hash_multiset(records, k):
    c = Counter()
    total = 0
    for rec in records:
        for _, h in R.kmer_hashes(rec, k):
            c[h] += 1
            total += 1
    return c, total


def kernel_hash_multiset(records, k, chunk_len, batch_rows, kmax=None):
    kmax = kmax or k
    fn = jax.jit(canonical_hashes, static_argnums=(1, 2))
    from ntcard_tpu.io.packing import aligned_stride

    stride = aligned_stride(chunk_len, kmax)
    c = Counter()
    total = 0
    for batch in pack_records(records, chunk_len, batch_rows, kmax):
        hi, lo, valid = fn(batch, k, stride)
        hi, lo, valid = np.asarray(hi), np.asarray(lo), np.asarray(valid)
        hs = (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)
        for h in hs[valid]:
            c[int(h)] += 1
        total += int(valid.sum())
    return c, total


@pytest.mark.parametrize("k", [4, 12, 31, 33, 64])
def test_kernel_matches_oracle_random_mix(k):
    records = random_records(seed=k, n=40, maxlen=200)
    want, want_n = oracle_hash_multiset(records, k)
    got, got_n = kernel_hash_multiset(records, k, chunk_len=256, batch_rows=128)
    assert got_n == want_n
    assert got == want


def test_kernel_long_contig_spanning_chunks():
    # one 5000-base contig with N runs -> many chunks, halo correctness
    rng = random.Random(7)
    contig = "".join(
        rng.choice("ACGT") if rng.random() > 0.02 else "N" for _ in range(5000)
    ).encode()
    k = 21
    want, want_n = oracle_hash_multiset([contig], k)
    got, got_n = kernel_hash_multiset([contig], k, chunk_len=128, batch_rows=128)
    assert got_n == want_n
    assert got == want


def test_kernel_multi_k_shared_packing():
    # ks smaller than kmax share the same packed stream
    records = random_records(seed=3, n=30, maxlen=150)
    for k in (5, 17, 32):
        want, want_n = oracle_hash_multiset(records, k)
        got, got_n = kernel_hash_multiset(
            records, k, chunk_len=256, batch_rows=128, kmax=33
        )
        assert got_n == want_n, k
        assert got == want, k


def test_kernel_edge_records():
    records = [b"", b"A", b"ACG", b"N" * 50, b"ACGT" * 10, b"AC" + b"N" + b"GT" * 8]
    k = 4
    want, want_n = oracle_hash_multiset(records, k)
    got, got_n = kernel_hash_multiset(records, k, chunk_len=64, batch_rows=128)
    assert got_n == want_n
    assert got == want


def test_packer_geometry_independence():
    records = random_records(seed=11, n=25, maxlen=120, alphabet="ACGT")
    k = 15
    ref, ref_n = oracle_hash_multiset(records, k)
    for chunk_len, rows in ((64, 128), (256, 128), (512, 256)):
        got, got_n = kernel_hash_multiset(records, k, chunk_len, rows)
        assert got_n == ref_n, (chunk_len, rows)
        assert got == ref, (chunk_len, rows)


def test_packer_batch_shapes():
    p = StreamPacker(chunk_len=64, batch_rows=128, kmax=16)
    batches = list(pack_records([b"ACGT" * 500] * 5, packer=p))
    assert all(b.shape == (128, 64) and b.dtype == np.uint8 for b in batches)


def test_scan_backend_matches_wxor():
    """The sequential lax.scan implementation (ops/nthash_scan.py) and the
    rotated-prefix-XOR implementation (ops/nthash.py) are independent
    derivations of the same math; they must agree exactly."""
    import jax
    import numpy as np

    from ntcard_tpu.io.packing import StreamPacker
    from ntcard_tpu.ops import nthash as W
    from ntcard_tpu.ops import nthash_scan as S

    records = random_records(seed=99, n=30, maxlen=300)
    chunk_len, kmax = 256, 33
    packer = StreamPacker(chunk_len, 128, kmax)
    stride = packer.stride
    k = 33
    for rec in records:
        for batch in packer.feed(rec):
            pass
    batches = list(packer.finish())
    assert batches
    for batch in batches:
        wh, wl, wv = jax.jit(W.canonical_hashes, static_argnums=(1, 2))(batch, k, stride)
        sh, sl, sv = jax.jit(S.canonical_hashes, static_argnums=(1, 2))(batch, k, stride)
        np.testing.assert_array_equal(np.asarray(wv), np.asarray(sv))
        v = np.asarray(wv)
        np.testing.assert_array_equal(np.asarray(wh)[v], np.asarray(sh)[v])
        np.testing.assert_array_equal(np.asarray(wl)[v], np.asarray(sl)[v])
