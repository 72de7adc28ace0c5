"""Hybrid SC -> SCL decoder tests (the reference's disabled hybSCL path,
my_sn/fec/polar/dec.py:437-470, working here).

Key invariant: per-batch-column decoder determinism makes the compacted SCL
re-decode bit-identical to a full-batch CA-SCL for the re-decoded rows, so
hybrid output must EXACTLY equal CA-SCL output on every block whose SC
output failed CRC, and must pass CRC on every block where SC succeeded.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from polar_tpu.models.polar.hybrid import HybridSCLDecoder
from polar_tpu.models.polar.scl import PolarSCLDecoder
from polar_tpu.models.polar.encode import PolarEncoder, Polar5GEncoder
from polar_tpu.models.polar.decode5g import Polar5GDecoder
from polar_tpu.models.polar.construction import generate_5g_ranking
from polar_tpu.ops.crc import CRCEncoder, crc_polynomial


def _crc_batch(n, k, crc_degree, ebno_db, bs, seed=0):
    """(frozen, logits, u_with_crc) with valid CRC payloads at ebno_db."""
    frozen, _ = generate_5g_ranking(k, n)
    _, crc_len = crc_polynomial(crc_degree)
    crc_enc = CRCEncoder(crc_degree, k=k - crc_len)
    enc = PolarEncoder(frozen, n)
    rng = np.random.default_rng(seed)
    payload = rng.integers(0, 2, size=(bs, k - crc_len)).astype(np.float32)
    u = np.asarray(crc_enc(jnp.asarray(payload)))
    c = np.asarray(enc(jnp.asarray(u)))
    sigma = np.sqrt(1.0 / (2 * 10 ** (ebno_db / 10) * (k / n)))
    noisy = (2.0 * c - 1.0) + rng.normal(
        0, sigma, size=c.shape).astype(np.float32)
    return frozen, (2.0 / sigma**2) * noisy, u


def test_hybrid_failed_blocks_bit_equal_ca_scl():
    n, k, deg = 64, 32, "CRC11"
    frozen, logits, u = _crc_batch(n, k, deg, ebno_db=1.0, bs=256)
    hyb = HybridSCLDecoder(frozen, n, list_size=8, crc_degree=deg,
                           min_capacity=4, return_crc_status=True)
    scl = PolarSCLDecoder(frozen, n, list_size=8, crc_degree=deg,
                          return_crc_status=True)
    out_h, st_h = hyb(jnp.asarray(logits))
    out_s, st_s = scl(jnp.asarray(logits))
    out_h, out_s = np.asarray(out_h), np.asarray(out_s)
    # which blocks went through the SCL re-decode?
    _, sc_ok = hyb._jit_sc_crc(jnp.asarray(logits))
    sc_ok = np.asarray(sc_ok)
    assert (~sc_ok).sum() > 0, "fixture too easy: SC never failed"
    assert sc_ok.sum() > 0, "fixture too hard: SC never passed"
    np.testing.assert_array_equal(out_h[~sc_ok], out_s[~sc_ok])
    np.testing.assert_array_equal(np.asarray(st_h)[~sc_ok],
                                  np.asarray(st_s)[~sc_ok])
    # SC-accepted blocks pass CRC by construction
    assert np.asarray(st_h)[sc_ok].all()


def test_hybrid_noiseless_pure_sc_path():
    n, k, deg = 64, 32, "CRC11"
    frozen, logits, u = _crc_batch(n, k, deg, ebno_db=30.0, bs=32)
    hyb = HybridSCLDecoder(frozen, n, list_size=8, crc_degree=deg)
    out = np.asarray(hyb(jnp.asarray(logits)))
    np.testing.assert_array_equal(out, u)


def test_hybrid_scan_engine_parity():
    """Compacted re-decode == full CA-SCL on the scan engine too (n=256)."""
    n, k, deg = 256, 128, "CRC11"
    frozen, logits, _ = _crc_batch(n, k, deg, ebno_db=1.5, bs=128, seed=3)
    hyb = HybridSCLDecoder(frozen, n, list_size=8, crc_degree=deg,
                           min_capacity=8)
    scl = PolarSCLDecoder(frozen, n, list_size=8, crc_degree=deg)
    out_h = np.asarray(hyb(jnp.asarray(logits)))
    out_s = np.asarray(scl(jnp.asarray(logits)))
    _, sc_ok = hyb._jit_sc_crc(jnp.asarray(logits))
    sc_ok = np.asarray(sc_ok)
    assert (~sc_ok).sum() > 0
    np.testing.assert_array_equal(out_h[~sc_ok], out_s[~sc_ok])


def test_scl_constructor_delegates_hybrid():
    n, k, deg = 64, 32, "CRC11"
    frozen, logits, _ = _crc_batch(n, k, deg, ebno_db=1.0, bs=64, seed=1)
    via_flag = PolarSCLDecoder(frozen, n, list_size=8, crc_degree=deg,
                               use_hybrid_sc=True)
    assert via_flag.requires_host
    direct = HybridSCLDecoder(frozen, n, list_size=8, crc_degree=deg)
    np.testing.assert_array_equal(np.asarray(via_flag(jnp.asarray(logits))),
                                  np.asarray(direct(jnp.asarray(logits))))
    with pytest.raises(RuntimeError):
        via_flag.decode(jnp.asarray(logits))
    with pytest.raises(ValueError):
        PolarSCLDecoder(frozen, n, use_hybrid_sc=True)  # needs CRC


def test_polar5g_hybscl():
    enc = Polar5GEncoder(k=64, n=128)
    dec_h = Polar5GDecoder(enc, dec_type="hybSCL", list_size=8,
                           return_crc_status=True)
    dec_s = Polar5GDecoder(enc, dec_type="SCL", list_size=8,
                           return_crc_status=True)
    rng = np.random.default_rng(7)
    u = rng.integers(0, 2, size=(128, 64)).astype(np.float32)
    c = np.asarray(enc(jnp.asarray(u)))
    sigma = 0.85
    logits = (2.0 / sigma**2) * ((2.0 * c - 1.0) + rng.normal(
        0, sigma, size=c.shape).astype(np.float32))
    uh, sh = dec_h(jnp.asarray(logits))
    us, ss = dec_s(jnp.asarray(logits))
    uh, us = np.asarray(uh), np.asarray(us)
    # inner-CRC failures after SC went through the full CA-SCL path
    _, sc_ok = dec_h._polar_dec._jit_sc_crc(dec_h._jit_front(
        jnp.asarray(logits)))
    sc_ok = np.asarray(sc_ok)
    assert (~sc_ok).sum() > 0
    np.testing.assert_array_equal(uh[~sc_ok], us[~sc_ok])
    # BLER of the hybrid must track CA-SCL closely on this fixed batch
    bler_h = np.mean(np.any(uh != u, axis=1))
    bler_s = np.mean(np.any(us != u, axis=1))
    assert bler_h <= bler_s + 0.03, (bler_h, bler_s)
    with pytest.raises(RuntimeError):
        dec_h.decode(jnp.asarray(logits))


def test_hybrid_pipelined_matches_per_batch():
    """decode_pipelined (one mask sync, cross-batch SCL) must produce
    exactly the per-batch __call__ results for every batch."""
    n, k, deg = 64, 32, "CRC11"
    hyb = HybridSCLDecoder(frozen_pos=_crc_batch(n, k, deg, 1.0, 8)[0],
                           n=n, list_size=8, crc_degree=deg,
                           min_capacity=4, return_crc_status=True)
    batches = [
        jnp.asarray(_crc_batch(n, k, deg, ebno_db=1.0, bs=bs, seed=s)[1])
        for bs, s in ((48, 11), (64, 12), (16, 13))
    ]
    piped = hyb.decode_pipelined(batches, scl_batch=32)
    for llr, (u_p, st_p) in zip(batches, piped):
        u_c, st_c = hyb(llr)
        np.testing.assert_array_equal(np.asarray(u_p), np.asarray(u_c))
        np.testing.assert_array_equal(np.asarray(st_p), np.asarray(st_c))


def test_polar5g_pipelined_matches_per_batch():
    enc = Polar5GEncoder(k=64, n=128)
    dec = Polar5GDecoder(enc, dec_type="hybSCL", list_size=8)
    rng = np.random.default_rng(9)
    batches = []
    for bs in (32, 48):
        u = rng.integers(0, 2, size=(bs, 64)).astype(np.float32)
        c = np.asarray(enc(jnp.asarray(u)))
        sigma = 0.85
        batches.append(jnp.asarray(
            (2.0 / sigma**2) * ((2.0 * c - 1.0) + rng.normal(
                0, sigma, size=c.shape).astype(np.float32))))
    piped = dec.decode_pipelined(batches, scl_batch=64)
    for llr, u_p in zip(batches, piped):
        np.testing.assert_array_equal(np.asarray(u_p),
                                      np.asarray(dec(llr)))


def test_hybrid_in_sim_ber():
    """sim_ber drives a host-orchestrated chain end to end."""
    from polar_tpu.models.systems import SystemAWGNModel
    from polar_tpu.sim import sim_ber
    n, k, deg = 64, 32, "CRC11"
    frozen, _ = generate_5g_ranking(k, n)
    _, crc_len = crc_polynomial(deg)
    enc = PolarEncoder(frozen, n)
    hyb = HybridSCLDecoder(frozen, n, list_size=8, crc_degree=deg,
                           min_capacity=4)
    model = SystemAWGNModel(n, k, enc, hyb)
    assert model.requires_host
    ber, bler = sim_ber(model, [2.0, 4.0], batch_size=64, max_mc_iter=2,
                        verbose=False)
    assert ber.shape == (2,)
    assert 0.0 <= ber[0] <= 1.0 and ber[1] <= ber[0] + 0.05
