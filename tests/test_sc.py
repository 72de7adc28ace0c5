"""SC decoder tests: bit-exact parity with both reference SC variants on
identical LLR inputs, round-trip, and tie-break behavior."""

import numpy as np
import jax.numpy as jnp
import pytest

from polar_tpu.models.polar.sc import PolarSCDecoder
from polar_tpu.models.polar.encode import PolarEncoder
from polar_tpu.models.polar.construction import generate_5g_ranking


@pytest.mark.parametrize("n", [64, 256])
def test_sc_minsum_matches_reference(decoders_fix, n):
    frozen = decoders_fix[f"n{n}_frozen_pos"]
    llr = decoders_fix[f"n{n}_llr"]
    dec = PolarSCDecoder(frozen, n, mode="minsum")
    got = np.asarray(dec(jnp.asarray(llr)))
    np.testing.assert_array_equal(got, decoders_fix[f"n{n}_sc_minsum"])


@pytest.mark.parametrize("n", [64, 256])
def test_sc_exact_matches_reference(decoders_fix, n):
    frozen = decoders_fix[f"n{n}_frozen_pos"]
    llr = decoders_fix[f"n{n}_llr"]
    dec = PolarSCDecoder(frozen, n, mode="exact")
    got = np.asarray(dec(jnp.asarray(llr)))
    np.testing.assert_array_equal(got, decoders_fix[f"n{n}_sc_exact"])


@pytest.mark.parametrize("mode", ["minsum", "exact"])
@pytest.mark.parametrize("n", [2, 16, 128])
def test_sc_roundtrip_noiseless(mode, n):
    k = max(1, n // 2)
    frozen, _ = generate_5g_ranking(k, n, strict=False)
    enc = PolarEncoder(frozen, n)
    dec = PolarSCDecoder(frozen, n, mode=mode)
    rng = np.random.default_rng(n)
    u = rng.integers(0, 2, size=(16, k)).astype(np.float32)
    c = enc(jnp.asarray(u))
    logits = (2.0 * np.asarray(c) - 1.0) * 10.0
    np.testing.assert_array_equal(np.asarray(dec(jnp.asarray(logits))), u)


def test_sc_zero_llr_tiebreak_decides_one():
    # reference leaf tie-break: exact-0 LLR -> bit 1
    # (x_run_sn_polar/polar/polar_sc.py:96-97)
    n, k = 2, 2
    dec = PolarSCDecoder([], n)
    out = np.asarray(dec(jnp.zeros((1, n))))
    np.testing.assert_array_equal(out, [[1.0, 1.0]])


def test_sc_leading_dims():
    n, k = 32, 16
    frozen, _ = generate_5g_ranking(k, n)
    dec = PolarSCDecoder(frozen, n)
    rng = np.random.default_rng(0)
    llr = rng.normal(size=(3, 5, n)).astype(np.float32)
    out = dec(jnp.asarray(llr))
    assert out.shape == (3, 5, k)
    flat = dec(jnp.asarray(llr.reshape(-1, n)))
    np.testing.assert_array_equal(np.asarray(out).reshape(-1, k),
                                  np.asarray(flat))
