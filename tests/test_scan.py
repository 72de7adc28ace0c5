"""Scan-engine equivalence: the O(log^2 n)-program `lax.scan` sweeps
(scan_core.py) must be bit-identical to the unrolled-tree decoders."""

import numpy as np
import jax.numpy as jnp
import pytest

from polar_tpu.models.polar.sc import PolarSCDecoder
from polar_tpu.models.polar.scl import PolarSCLDecoder
from polar_tpu.models.polar.construction import generate_5g_ranking


@pytest.mark.parametrize("mode", ["minsum", "exact"])
@pytest.mark.parametrize("n", [2, 16, 128])
def test_sc_scan_equals_unrolled(n, mode):
    k = n // 2
    frozen, _ = generate_5g_ranking(k, n, strict=False)
    rng = np.random.default_rng(n)
    llr = rng.normal(0, 3, size=(16, n)).astype(np.float32)
    a = PolarSCDecoder(frozen, n, mode=mode,
                       schedule="unrolled")(jnp.asarray(llr))
    b = PolarSCDecoder(frozen, n, mode=mode,
                       schedule="scan")(jnp.asarray(llr))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("list_size", [1, 4])
@pytest.mark.parametrize("n", [2, 16, 128])
def test_scl_scan_equals_unrolled(n, list_size):
    k = n // 2
    frozen, _ = generate_5g_ranking(k, n, strict=False)
    rng = np.random.default_rng(n + 1)
    llr = rng.normal(0, 3, size=(16, n)).astype(np.float32)
    a = PolarSCLDecoder(frozen, n, list_size=list_size, use_fast_scl=False,
                        schedule="unrolled")(jnp.asarray(llr))
    b = PolarSCLDecoder(frozen, n, list_size=list_size,
                        schedule="scan")(jnp.asarray(llr))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scl_scan_with_crc_matches_unrolled():
    n, k = 64, 32
    frozen, _ = generate_5g_ranking(k, n)
    rng = np.random.default_rng(4)
    llr = rng.normal(0, 3, size=(16, n)).astype(np.float32)
    a = PolarSCLDecoder(frozen, n, list_size=4, crc_degree="CRC11",
                        use_fast_scl=False,
                        schedule="unrolled")(jnp.asarray(llr))
    b = PolarSCLDecoder(frozen, n, list_size=4, crc_degree="CRC11",
                        schedule="scan")(jnp.asarray(llr))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_auto_schedule_selection():
    frozen, _ = generate_5g_ranking(16, 32)
    assert PolarSCDecoder(frozen, 32).schedule == "unrolled"
    frozen1k, _ = generate_5g_ranking(512, 1024)
    assert PolarSCDecoder(frozen1k, 1024).schedule == "scan"
    assert PolarSCLDecoder(frozen1k, 1024).schedule == "scan"


@pytest.mark.parametrize("lower_stages", [1, 3, 5])
def test_hybrid_sweeps_equal_plain(lower_stages):
    from polar_tpu.models.polar.scan_core import (
        sc_sweep, sc_sweep_hybrid, scl_sweep, scl_sweep_hybrid)
    n, k = 64, 32
    frozen, _ = generate_5g_ranking(k, n)
    mask = np.zeros(n, bool)
    mask[frozen] = True
    rng = np.random.default_rng(7)
    llr = jnp.asarray(rng.normal(0, 3, (n, 16)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(sc_sweep(llr, mask)),
        np.asarray(sc_sweep_hybrid(llr, mask, lower_stages=lower_stages)))
    ua, pa = scl_sweep(llr, mask, 4)
    ub, pb = scl_sweep_hybrid(llr, mask, 4, lower_stages=lower_stages)
    np.testing.assert_array_equal(np.asarray(ua), np.asarray(ub))
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=1e-6)


def test_sc_pallas_equals_xla():
    from polar_tpu.models.polar.scan_core import sc_sweep, sc_sweep_hybrid
    n = 128
    frozen, _ = generate_5g_ranking(n // 2, n)
    mask = np.zeros(n, bool)
    mask[frozen] = True
    rng = np.random.default_rng(14)
    llr = jnp.asarray(rng.normal(0, 3, (n, 128)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(sc_sweep(llr, mask)),
        np.asarray(sc_sweep_hybrid(llr, mask, use_pallas=True)))


@pytest.mark.parametrize("list_size", [4, 8])
def test_pallas_subtree_equals_xla(list_size):
    # interpret mode on CPU; the same kernel runs compiled on TPU and is
    # covered by bench.py / the CLI there
    from polar_tpu.models.polar.scan_core import scl_sweep, scl_sweep_hybrid
    n = 128
    frozen, _ = generate_5g_ranking(n // 2, n)
    mask = np.zeros(n, bool)
    mask[frozen] = True
    rng = np.random.default_rng(13)
    llr = jnp.asarray(rng.normal(0, 3, (n, 128)), jnp.float32)
    ua, pa = scl_sweep(llr, mask, list_size)
    ub, pb = scl_sweep_hybrid(llr, mask, list_size, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(ua), np.asarray(ub))
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=1e-5)


def test_pallas_static_subtree_equals_xla():
    """m = n/2^b <= 8 unrolls the outer sweep, which engages the
    code-specialized static-frozen kernel (frz_static) with
    liveness-pruned pointer composition; equality vs the plain engine
    proves both bit-identical."""
    from polar_tpu.models.polar.scan_core import scl_sweep, scl_sweep_hybrid
    n = 32
    frozen, _ = generate_5g_ranking(n // 2, n)
    mask = np.zeros(n, bool)
    mask[frozen] = True
    rng = np.random.default_rng(17)
    llr = jnp.asarray(rng.normal(0, 3, (n, 128)), jnp.float32)
    ua, pa = scl_sweep(llr, mask, 8)
    ub, pb = scl_sweep_hybrid(llr, mask, 8, lower_stages=2,
                              use_pallas=True)
    np.testing.assert_array_equal(np.asarray(ua), np.asarray(ub))
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=1e-5)


def test_pallas_blocked_subtree_equals_xla():
    """L=16 routes to the blocked kernel (lists of (8, TB) blocks); one
    tiny config keeps XLA-CPU's interpret-mode compile tolerable — the
    compiled kernel at L in {16, 32} is covered by the TPU lane."""
    from polar_tpu.models.polar.scan_core import scl_sweep, scl_sweep_hybrid
    n = 32
    frozen, _ = generate_5g_ranking(n // 2, n)
    mask = np.zeros(n, bool)
    mask[frozen] = True
    rng = np.random.default_rng(23)
    llr = jnp.asarray(rng.normal(0, 3, (n, 128)), jnp.float32)
    ua, pa = scl_sweep(llr, mask, 16)
    ub, pb = scl_sweep_hybrid(llr, mask, 16, lower_stages=2,
                              use_pallas=True)
    np.testing.assert_array_equal(np.asarray(ua), np.asarray(ub))
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=1e-5)


def test_leaf_schedule():
    from polar_tpu.models.polar.scan_core import leaf_schedule
    S, desc, rise = leaf_schedule(8)
    assert S == 3
    np.testing.assert_array_equal(desc, [3, 0, 1, 0, 2, 0, 1, 0])
    np.testing.assert_array_equal(rise, [0, 1, 0, 2, 0, 1, 0, 3])
