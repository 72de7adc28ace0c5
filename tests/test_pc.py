"""TS 38.212 PC-bit chain tests (uplink 12 <= k <= 19).

The reference deliberately omits PC bits (my_sn/fec/polar/enc.py:262-268),
so there are no reference fixtures; correctness is established by spec
properties (placement rules, register behavior) + end-to-end consistency
between the independent encoder register (lax.scan) and the decoders'
per-path registers (trace-time recursion).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from polar_tpu.models.polar import pc
from polar_tpu.models.polar.encode import Polar5GEncoder
from polar_tpu.models.polar.decode5g import Polar5GDecoder


def _register_reference(u_scattered, is_data, is_pc):
    """Plain-Python twin of the TS 38.212 shift register."""
    out = np.array(u_scattered, dtype=np.float32, copy=True)
    for b in range(out.shape[0]):
        y = [0] * 5
        for i in range(out.shape[1]):
            y = y[1:] + y[:1]  # left cyclic: new y0 = old y1
            if is_pc[i]:
                out[b, i] = y[0]
            elif is_data[i]:
                y[0] ^= int(out[b, i])
    return out


def test_pc_expand_matches_python_register():
    rng = np.random.default_rng(0)
    n = 64
    is_data = rng.random(n) < 0.3
    is_pc = (~is_data) & (rng.random(n) < 0.1)
    u = np.where(is_data, rng.integers(0, 2, size=(8, n)), 0).astype(
        np.float32)
    got = np.asarray(pc.pc_expand(jnp.asarray(u), is_data, is_pc))
    np.testing.assert_array_equal(got, _register_reference(u, is_data, is_pc))


def test_pc_skipped_when_infeasible():
    # E = 18, K = 18: the 3 PC bits cannot fit (rate would exceed 1)
    enc = Polar5GEncoder(k=12, n=18)
    assert enc.pc_pos is None


@pytest.mark.parametrize("k,n", [(12, 48), (16, 64), (19, 256)])
def test_pc_placement_spec_properties(k, n):
    enc = Polar5GEncoder(k=k, n=n)
    assert enc.pc_pos is not None and len(enc.pc_pos) == 3
    # PC positions are non-frozen and within the selected reliable set
    assert len(np.intersect1d(enc.pc_pos, enc.frozen_pos)) == 0
    assert np.all(np.isin(enc.pc_pos, enc.info_pos))
    # decoder-visible info payload is K = k + 6 (CRC6), PC excluded
    assert enc.k_polar == k + 6 + 3
    # n_pc_wm rule: one PC bit placed by min row weight iff E-K+3 > 192
    wm = pc.n_pc_wm(n, k + 6)
    assert wm == (1 if n - (k + 6) + 3 > 192 else 0)
    if wm:
        # the wm-placed bit has the minimum generator row weight among the
        # selected reliable set (weights are 2^popcount)
        weights = {int(p): 1 << bin(int(p)).count("1") for p in enc.info_pos}
        assert min(weights[int(p)] for p in enc.pc_pos) == \
            min(weights.values())


@pytest.mark.parametrize("dec_type", ["SC", "SCL", "hybSCL"])
@pytest.mark.parametrize("k,n", [(16, 64), (12, 48)])
def test_pc_chain_roundtrip(k, n, dec_type):
    """Noiseless encode->decode over the PC chain returns the payload —
    this couples the encoder's scan register with the decoders' per-path
    registers bit-for-bit."""
    enc = Polar5GEncoder(k=k, n=n)
    dec = Polar5GDecoder(enc, dec_type=dec_type, list_size=4)
    rng = np.random.default_rng(k + n)
    u = rng.integers(0, 2, size=(8, k)).astype(np.float32)
    cw = np.asarray(enc(jnp.asarray(u)))
    assert cw.shape == (8, n)
    logits = (2.0 * cw - 1.0) * 10.0
    u_hat = dec(jnp.asarray(logits))
    np.testing.assert_array_equal(np.asarray(u_hat), u)


def test_pc_improves_over_no_pc_scl():
    """At equal (k, n), the standards-correct PC code must not be worse
    than the reference's no-PC encoding under SCL-4 (fixed seed; PC bits
    act as a 3-bit inner code on the least reliable selected channels)."""
    k, n, ebno = 16, 64, 2.5
    rng = np.random.default_rng(1)
    blers = {}
    for use_pc in (True, False):
        enc = Polar5GEncoder(k=k, n=n, enable_pc=use_pc)
        dec = Polar5GDecoder(enc, dec_type="SCL", list_size=4)
        u = rng.integers(0, 2, size=(512, k)).astype(np.float32)
        c = np.asarray(enc(jnp.asarray(u)))
        sigma = np.sqrt(1.0 / (2 * 10 ** (ebno / 10) * (k / n)))
        noisy = (2.0 * c - 1.0) + rng.normal(
            0, sigma, size=c.shape).astype(np.float32)
        d = np.asarray(dec(jnp.asarray((2.0 / sigma**2) * noisy)))
        blers[use_pc] = np.mean(np.any(d != u, axis=1))
    assert blers[True] <= blers[False] + 0.02, blers


def test_pc_crc_status_works():
    enc = Polar5GEncoder(k=16, n=64)
    dec = Polar5GDecoder(enc, dec_type="SCL", list_size=8,
                         return_crc_status=True)
    rng = np.random.default_rng(3)
    u = rng.integers(0, 2, size=(6, 16)).astype(np.float32)
    cw = np.asarray(enc(jnp.asarray(u)))
    u_hat, status = dec(jnp.asarray((2.0 * cw - 1.0) * 10.0))
    np.testing.assert_array_equal(np.asarray(u_hat), u)
    assert bool(jnp.all(status))
