"""Full 5G rate-matched chain tests: decoder parity vs reference fixtures,
round-trips over all rate-matching regimes (repetition / puncturing /
shortening), uplink + downlink, and CRC status reporting."""

import numpy as np
import jax.numpy as jnp
import pytest

from polar_tpu.models.polar.encode import Polar5GEncoder
from polar_tpu.models.polar.decode5g import Polar5GDecoder


@pytest.mark.parametrize("k,n", [(32, 140), (20, 90), (40, 100),
                                 (12, 48), (64, 200)])
def test_5g_scl_decoder_matches_reference(polar5g_fix, k, n):
    # enable_pc=False: fixtures come from the reference's no-PC encoding
    # (tests/test_pc.py covers the standards-correct PC chain)
    enc = Polar5GEncoder(k=k, n=n, enable_pc=False)
    # the reference my_sn SCL decoder uses the exact f-function
    dec = Polar5GDecoder(enc, dec_type="SCL", list_size=8, mode="exact")
    llr = polar5g_fix[f"ul_k{k}_n{n}_llr"]
    got = np.asarray(dec(jnp.asarray(llr)))
    np.testing.assert_array_equal(got, polar5g_fix[f"ul_k{k}_n{n}_uhat_scl8"])


@pytest.mark.parametrize("k,n,dec_type", [
    # every rate-matching regime for SC; SCL (costlier compiles) covers the
    # three canonical regimes — the rate-recovery code is shared
    (32, 140, "SC"),    # repetition (n_target > n_polar=128)
    (20, 90, "SC"),     # puncturing (rate 31/90 <= 7/16)
    (40, 100, "SC"),    # shortening (rate 51/100 > 7/16)
    (90, 110, "SC"),    # high-rate shortening
    (12, 18, "SC"),     # minimum n
    (132, 1088, "SC"),  # maximum n (repetition over n_polar=1024)
    (32, 140, "SCL"),
    (20, 90, "SCL"),
    (40, 100, "SCL"),
])
def test_5g_uplink_roundtrip(k, n, dec_type):
    enc = Polar5GEncoder(k=k, n=n)
    dec = Polar5GDecoder(enc, dec_type=dec_type, list_size=4)
    rng = np.random.default_rng(k * 1000 + n)
    u = rng.integers(0, 2, size=(4, k)).astype(np.float32)
    cw = enc(jnp.asarray(u))
    assert cw.shape == (4, n)
    logits = (2.0 * np.asarray(cw) - 1.0) * 10.0
    u_hat = np.asarray(dec(jnp.asarray(logits)))
    np.testing.assert_array_equal(u_hat, u)


@pytest.mark.parametrize("k,n,dec_type", [
    (30, 120, "SC"), (140, 576, "SC"), (25, 50, "SC"), (30, 120, "SCL"),
])
def test_5g_downlink_roundtrip(k, n, dec_type):
    enc = Polar5GEncoder(k=k, n=n, channel_type="downlink")
    dec = Polar5GDecoder(enc, dec_type=dec_type, list_size=4)
    rng = np.random.default_rng(k + n)
    u = rng.integers(0, 2, size=(4, k)).astype(np.float32)
    cw = enc(jnp.asarray(u))
    logits = (2.0 * np.asarray(cw) - 1.0) * 10.0
    u_hat = np.asarray(dec(jnp.asarray(logits)))
    np.testing.assert_array_equal(u_hat, u)


def test_5g_crc_status():
    enc = Polar5GEncoder(k=40, n=100)
    dec = Polar5GDecoder(enc, dec_type="SCL", list_size=8,
                         return_crc_status=True)
    rng = np.random.default_rng(5)
    u = rng.integers(0, 2, size=(6, 40)).astype(np.float32)
    cw = np.asarray(enc(jnp.asarray(u)))
    logits = (2.0 * cw - 1.0) * 10.0
    u_hat, status = dec(jnp.asarray(logits))
    np.testing.assert_array_equal(np.asarray(u_hat), u)
    assert bool(jnp.all(status))
    _, status_bad = dec(jnp.asarray(
        rng.normal(0, 0.5, size=(6, 100)).astype(np.float32)))
    assert not bool(jnp.all(status_bad))


def test_5g_encoder_limits():
    with pytest.raises(AssertionError):
        Polar5GEncoder(k=1014, n=1088)
    with pytest.raises(AssertionError):
        Polar5GEncoder(k=10, n=17)
    with pytest.raises(ValueError):
        Polar5GEncoder(k=11, n=48)  # k < 12 unsupported in uplink
    with pytest.raises(AssertionError):
        Polar5GEncoder(k=141, n=400, channel_type="downlink")
    with pytest.raises(ValueError):
        enc = Polar5GEncoder(k=40, n=100)
        Polar5GDecoder(enc, dec_type="nonsense")
