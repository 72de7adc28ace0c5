"""CRC tests: parity vs reference fixtures, an independent long-division
check, and detection properties."""

import numpy as np
import jax.numpy as jnp
import pytest

from polar_tpu.ops.crc import (CRCEncoder, CRCDecoder, crc_polynomial,
                               crc_generator_matrix, CRC_POLYNOMIALS)

DEGREES = list(CRC_POLYNOMIALS)


def _crc_longdiv(bits, poly):
    """Plain shift-register CRC (independent oracle)."""
    L = len(poly) - 1
    reg = np.concatenate([bits.astype(np.int64), np.zeros(L, np.int64)])
    for i in range(len(bits)):
        if reg[i]:
            reg[i:i + L + 1] ^= poly
    return reg[-L:]


@pytest.mark.parametrize("deg", DEGREES)
def test_crc_matches_reference(crc_fix, deg):
    bits = crc_fix[f"{deg}_in"]
    want = crc_fix[f"{deg}_out"]
    enc = CRCEncoder(deg, k=bits.shape[-1])
    got = np.asarray(enc(jnp.asarray(bits)))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("deg", DEGREES)
def test_crc_matches_longdiv(deg):
    rng = np.random.default_rng(3)
    poly, L = crc_polynomial(deg)
    k = 57
    enc = CRCEncoder(deg, k=k)
    bits = rng.integers(0, 2, size=(4, k)).astype(np.float32)
    got = np.asarray(enc(jnp.asarray(bits)))
    for row_in, row_out in zip(bits, got):
        np.testing.assert_array_equal(row_out[:k], row_in)
        np.testing.assert_array_equal(
            row_out[k:], _crc_longdiv(row_in.astype(np.int64), poly))


@pytest.mark.parametrize("deg", DEGREES)
def test_crc_roundtrip_and_detection(deg):
    rng = np.random.default_rng(5)
    k = 40
    enc = CRCEncoder(deg, k=k)
    dec = CRCDecoder(enc)
    bits = rng.integers(0, 2, size=(16, k)).astype(np.float32)
    word = enc(jnp.asarray(bits))
    info, valid = dec(word)
    np.testing.assert_array_equal(np.asarray(info), bits)
    assert bool(jnp.all(valid))
    # flip one random bit per word -> every CRC must fail
    word = np.asarray(word).astype(np.int64)
    for i in range(word.shape[0]):
        word[i, rng.integers(0, word.shape[1])] ^= 1
    _, valid = dec(jnp.asarray(word.astype(np.float32)))
    assert not bool(jnp.any(valid))


def test_crc_generator_matrix_linearity():
    # G-matrix rows are CRCs of unit vectors; encoding is linear over GF(2)
    poly, L = crc_polynomial("CRC11")
    k = 12
    g = crc_generator_matrix(k, "CRC11")
    for i in range(k):
        e = np.zeros(k, np.int64)
        e[i] = 1
        np.testing.assert_array_equal(g[i], _crc_longdiv(e, poly))
