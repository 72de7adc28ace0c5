"""OSD tests: parity vs reference fixtures and decoding properties."""

import numpy as np
import jax.numpy as jnp
import pytest

from polar_tpu.models.osd import OSDecoder
from polar_tpu.models.polar.encode import PolarEncoder
from polar_tpu.models.polar.construction import generate_5g_ranking


@pytest.fixture(scope="module")
def small_code():
    k, n = 16, 32
    frozen, _ = generate_5g_ranking(k, n)
    return PolarEncoder(frozen, n), k, n


@pytest.mark.parametrize("t", [0, 1, 2])
def test_osd_matches_reference(osd_fix, t):
    frozen = osd_fix["frozen_pos"]
    enc = PolarEncoder(frozen, 32)
    dec = OSDecoder(t=t, encoder=enc)
    llr = osd_fix[f"t{t}_llr"]
    got = np.asarray(dec(jnp.asarray(llr)))
    np.testing.assert_array_equal(got, osd_fix[f"t{t}_chat"])


def test_osd_outputs_valid_codewords(small_code):
    enc, k, n = small_code
    dec = OSDecoder(t=2, encoder=enc)
    rng = np.random.default_rng(1)
    llr = rng.normal(0, 2, size=(32, n)).astype(np.float32)
    c_hat = dec(jnp.asarray(llr))
    assert bool(jnp.all(enc.parity_check(c_hat)))


def test_osd_roundtrip_noiseless(small_code):
    enc, k, n = small_code
    dec = OSDecoder(t=1, encoder=enc)
    rng = np.random.default_rng(2)
    u = rng.integers(0, 2, size=(8, k)).astype(np.float32)
    c = np.asarray(enc(jnp.asarray(u)))
    logits = (2.0 * c - 1.0) * 8.0
    np.testing.assert_array_equal(np.asarray(dec(jnp.asarray(logits))), c)


def test_osd_higher_order_never_worse(small_code):
    # OSD-2's chosen codeword can't have larger LLR distance than OSD-0's
    enc, k, n = small_code
    rng = np.random.default_rng(3)
    llr = rng.normal(0, 1.5, size=(64, n)).astype(np.float32)
    outs = {}
    for t in (0, 2):
        dec = OSDecoder(t=t, encoder=enc)
        c = np.asarray(dec(jnp.asarray(llr)))
        # LLR distance metric (same as the decoder's internal one)
        sgn = llr * (1.0 - 2.0 * c)
        outs[t] = np.mean(np.logaddexp(0.0, sgn), axis=1)
    assert np.all(outs[2] <= outs[0] + 1e-6)


def test_osd_requires_encoder():
    with pytest.raises(AttributeError):
        OSDecoder(t=1, encoder=None)


def test_osd_large_code_chunked_sweep():
    """n=128, t=2 (C(64,2)+64 = 2080 patterns -> multiple scan chunks at
    chunk=1024): the padded lax.scan sweep must stay correct at scale —
    valid codewords, noiseless round-trip, and monotone t improvement."""
    k, n = 64, 128
    frozen, _ = generate_5g_ranking(k, n)
    enc = PolarEncoder(frozen, n)
    dec = OSDecoder(t=2, encoder=enc, pattern_chunk=1024)
    assert dec._pattern_chunks is not None
    assert dec._pattern_chunks.shape[0] > 1  # really exercises the scan
    rng = np.random.default_rng(4)
    u = rng.integers(0, 2, size=(8, k)).astype(np.float32)
    c = np.asarray(enc(jnp.asarray(u)))
    logits = (2.0 * c - 1.0) * 6.0
    np.testing.assert_array_equal(np.asarray(dec(jnp.asarray(logits))), c)
    llr = rng.normal(0, 2, size=(16, n)).astype(np.float32)
    c_hat = np.asarray(dec(jnp.asarray(llr)))
    assert bool(jnp.all(enc.parity_check(jnp.asarray(c_hat))))
    # strictly-better-or-equal vs t=0 under the decoder's own metric
    dec0 = OSDecoder(t=0, encoder=enc)
    c0 = np.asarray(dec0(jnp.asarray(llr)))
    d2 = np.mean(np.logaddexp(0.0, llr * (1.0 - 2.0 * c_hat)), axis=1)
    d0 = np.mean(np.logaddexp(0.0, llr * (1.0 - 2.0 * c0)), axis=1)
    assert np.all(d2 <= d0 + 1e-6)
