"""The Pallas VMEM-fused kernel must agree exactly with the XLA kernel
(which is itself oracle-verified). Runs in interpreter mode on CPU; the
compiled path is exercised on real TPU by the bench harness."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ntcard_tpu.ops.nthash import sketch_scan
from ntcard_tpu.ops.nthash_pallas import sketch_idx_pallas


@pytest.mark.parametrize("ks", [(12,), (12, 32), (64,)])
def test_pallas_matches_xla(ks):
    rng = np.random.default_rng(sum(ks))
    B, L = 128, 256
    kmax = max(ks)
    stride = ((L - kmax + 1) // 8) * 8
    codes = rng.integers(0, 5, size=(B, L), dtype=np.uint8)
    s_bits, r_bits = 7, 10
    r_buck = 1 << r_bits

    idx_p = np.asarray(
        sketch_idx_pallas(jnp.asarray(codes), ks, stride, s_bits, r_bits, interpret=True)
    )
    idx_x, f1_x = sketch_scan(jnp.asarray(codes), ks, stride, s_bits, r_bits)

    for t, k in enumerate(ks):
        xla = np.asarray(idx_x[k]).reshape(stride, B).T  # [B, S]
        pal = idx_p[t][:, :stride]
        # map the pallas two-sentinel protocol onto the XLA single sentinel
        pal_mapped = np.where(pal >= 2 * r_buck, 2 * r_buck, pal)
        np.testing.assert_array_equal(pal_mapped, xla)
        # F1 reconstruction: every non-sent1 position is a valid window
        assert int((idx_p[t] != 2 * r_buck + 1).sum()) == int(f1_x[k])
        # outside-stride positions are always sent1
        assert (idx_p[t][:, stride:] == 2 * r_buck + 1).all()


def test_pallas_sketch_update_bit_identical(monkeypatch):
    """NTCARD_KERNEL=pallas must yield the exact same tables/F1/finalize as
    the default path through the real product surface (CountTableSketch),
    including the nibble-packed wire format."""
    from ntcard_tpu.io.packing import pack_rows
    from ntcard_tpu.models import sketch as sk

    rng = np.random.default_rng(7)
    B, L = 128, 256
    ks, s_bits, r_bits = (12, 32), 7, 10
    stride = ((L - max(ks) + 1) // 8) * 8
    batches = [rng.integers(0, 5, size=(B, L), dtype=np.uint8) for _ in range(3)]

    def run(packed):
        s = sk.CountTableSketch(ks, s_bits, r_bits, stride)
        for b in batches:
            s.update(pack_rows(b) if packed else b, packed=packed)
        return s.finalize(return_table=True)

    base = run(False)
    # _update's jit cache is keyed on shapes/statics only, not the env var
    sk._update.clear_cache()
    monkeypatch.setenv("NTCARD_KERNEL", "pallas")
    try:
        for packed in (False, True):
            got = run(packed)
            for k in ks:
                assert got[k]["f1"] == base[k]["f1"]
                np.testing.assert_array_equal(got[k]["table"], base[k]["table"])
                np.testing.assert_array_equal(got[k]["hist"], base[k]["hist"])
    finally:
        sk._update.clear_cache()
