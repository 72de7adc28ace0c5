"""BP decoder tests: round-trip, convergence vs SC, soft output."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from polar_tpu.models.polar.bp import PolarBPDecoder
from polar_tpu.models.polar.sc import PolarSCDecoder
from polar_tpu.models.polar.encode import PolarEncoder
from polar_tpu.models.polar.construction import generate_5g_ranking


@pytest.mark.parametrize("mode", ["minsum", "exact"])
@pytest.mark.parametrize("n", [32, 128])
def test_bp_roundtrip_noiseless(n, mode):
    k = n // 2
    frozen, _ = generate_5g_ranking(k, n)
    enc = PolarEncoder(frozen, n)
    dec = PolarBPDecoder(frozen, n, num_iter=10, mode=mode)
    rng = np.random.default_rng(n)
    u = rng.integers(0, 2, size=(16, k)).astype(np.float32)
    c = np.asarray(enc(jnp.asarray(u)))
    logits = (2.0 * c - 1.0) * 8.0
    np.testing.assert_array_equal(np.asarray(dec(jnp.asarray(logits))), u)


def test_bp_close_to_sc_at_moderate_snr():
    n, k = 64, 32
    frozen, _ = generate_5g_ranking(k, n)
    enc = PolarEncoder(frozen, n)
    bp = PolarBPDecoder(frozen, n, num_iter=30)
    sc = PolarSCDecoder(frozen, n)
    rng = np.random.default_rng(1)
    u = rng.integers(0, 2, size=(256, k)).astype(np.float32)
    c = np.asarray(enc(jnp.asarray(u)))
    noisy = (2.0 * c - 1.0) * 2.5 + rng.normal(
        0, 1.0, size=c.shape).astype(np.float32)
    bler_bp = np.mean(np.any(np.asarray(bp(jnp.asarray(noisy))) != u, axis=1))
    bler_sc = np.mean(np.any(np.asarray(sc(jnp.asarray(noisy))) != u, axis=1))
    # BP should be in the same performance class as SC at this SNR
    assert bler_bp <= bler_sc + 0.1


def test_bp_soft_output():
    n, k = 32, 16
    frozen, _ = generate_5g_ranking(k, n)
    enc = PolarEncoder(frozen, n)
    dec_soft = PolarBPDecoder(frozen, n, num_iter=10, hard_out=False)
    dec_hard = PolarBPDecoder(frozen, n, num_iter=10, hard_out=True)
    rng = np.random.default_rng(2)
    u = rng.integers(0, 2, size=(8, k)).astype(np.float32)
    c = np.asarray(enc(jnp.asarray(u)))
    logits = (2.0 * c - 1.0) * 6.0
    soft = np.asarray(dec_soft(jnp.asarray(logits)))
    hard = np.asarray(dec_hard(jnp.asarray(logits)))
    # logit convention: positive soft output -> bit 1
    np.testing.assert_array_equal((soft > 0).astype(np.float32), hard)
    np.testing.assert_array_equal(hard, u)


def test_bp_more_iters_not_worse():
    n, k = 64, 32
    frozen, _ = generate_5g_ranking(k, n)
    enc = PolarEncoder(frozen, n)
    rng = np.random.default_rng(3)
    u = rng.integers(0, 2, size=(128, k)).astype(np.float32)
    c = np.asarray(enc(jnp.asarray(u)))
    noisy = (2.0 * c - 1.0) * 2.0 + rng.normal(
        0, 1.0, size=c.shape).astype(np.float32)
    blers = []
    for it in (2, 30):
        dec = PolarBPDecoder(frozen, n, num_iter=it)
        d = np.asarray(dec(jnp.asarray(noisy)))
        blers.append(np.mean(np.any(d != u, axis=1)))
    assert blers[1] <= blers[0] + 0.05
