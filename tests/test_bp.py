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


def _noisy_fixture(n, k, ebno_db=2.0, bs=256, seed=0):
    """Deterministic noisy (logits, u) pair for regression gating."""
    frozen, _ = generate_5g_ranking(k, n)
    enc = PolarEncoder(frozen, n)
    rng = np.random.default_rng(seed)
    u = rng.integers(0, 2, size=(bs, k)).astype(np.float32)
    c = np.asarray(enc(jnp.asarray(u)))
    sigma = np.sqrt(1.0 / (2 * 10 ** (ebno_db / 10) * (k / n)))
    noisy = (2.0 * c - 1.0) + rng.normal(
        0, sigma, size=c.shape).astype(np.float32)
    return frozen, (2.0 / sigma**2) * noisy, u


@pytest.mark.parametrize("n", [256, 1024])
def test_bp_large_n_in_sc_class(n):
    """Regression gate for the round-1 BP divergence at large n.

    Deterministic fixed-seed inputs, so these are exact (non-statistical)
    bounds: BP-40 must beat SC outright and BP-20 must stay within 2x the
    SC BER at 2 dB (measured: n=1024 BP-40 0.0097 / BP-20 0.0256 vs SC
    0.0147; unscaled round-1 min-sum scored 0.23).
    """
    k = n // 2
    frozen, logits, u = _noisy_fixture(n, k, bs=128 if n == 1024 else 256)
    sc = PolarSCDecoder(frozen, n)
    ber_sc = np.mean(np.asarray(sc(jnp.asarray(logits))) != u)
    bp40 = PolarBPDecoder(frozen, n, num_iter=40)
    ber_bp40 = np.mean(np.asarray(bp40(jnp.asarray(logits))) != u)
    assert ber_bp40 <= ber_sc, (ber_bp40, ber_sc)
    bp20 = PolarBPDecoder(frozen, n, num_iter=20)
    ber_bp20 = np.mean(np.asarray(bp20(jnp.asarray(logits))) != u)
    assert ber_bp20 <= 2.0 * ber_sc, (ber_bp20, ber_sc)


def test_bp_bf16_messages_close_to_f32():
    """msg_dtype=bfloat16 (the HBM-traffic lever for the XLA engine, see
    docs/PERFORMANCE.md BP roofline) must recover noiseless inputs exactly
    and stay in the f32 engine's BER class on fixed noisy inputs."""
    n, k = 256, 128
    frozen, _ = generate_5g_ranking(k, n)
    enc = PolarEncoder(frozen, n)
    rng = np.random.default_rng(5)
    u = rng.integers(0, 2, size=(32, k)).astype(np.float32)
    c = np.asarray(enc(jnp.asarray(u)))
    logits = (2.0 * c - 1.0) * 8.0
    bf = PolarBPDecoder(frozen, n, num_iter=20, msg_dtype=jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(bf(jnp.asarray(logits))), u)

    frozen, noisy, u = _noisy_fixture(n, k, bs=256)
    ber_bf = np.mean(np.asarray(bf(jnp.asarray(noisy))) != u)
    f32 = PolarBPDecoder(frozen, n, num_iter=20)
    ber_f32 = np.mean(np.asarray(f32(jnp.asarray(noisy))) != u)
    # bf16 rounding shifts individual marginal blocks, not the BER class
    assert ber_bf <= max(1.5 * ber_f32, ber_f32 + 0.01), (ber_bf, ber_f32)


def test_bp_early_stop_matches_full_run():
    """Early stopping must not degrade accuracy on a fixed input set:
    strict (at-or-better) when checking every sweep; within freeze-
    granularity noise at the default check_every."""
    n, k = 256, 128
    frozen, logits, u = _noisy_fixture(n, k)
    ber = {}
    for es in (True, False):
        dec = PolarBPDecoder(frozen, n, num_iter=40, early_stop=es,
                             check_every=1)
        ber[es] = np.mean(np.asarray(dec(jnp.asarray(logits))) != u)
    assert ber[True] <= ber[False] + 1e-9, ber
    dec = PolarBPDecoder(frozen, n, num_iter=40)  # default check_every
    ber_def = np.mean(np.asarray(dec(jnp.asarray(logits))) != u)
    assert ber_def <= ber[False] + 0.002, (ber_def, ber[False])


def test_bp_unscaled_minsum_still_available():
    """msf=1.0 recovers the raw (reference-style) min-sum check node."""
    n, k = 32, 16
    frozen, _ = generate_5g_ranking(k, n)
    enc = PolarEncoder(frozen, n)
    dec = PolarBPDecoder(frozen, n, num_iter=10, msf=1.0)
    rng = np.random.default_rng(7)
    u = rng.integers(0, 2, size=(8, k)).astype(np.float32)
    c = np.asarray(enc(jnp.asarray(u)))
    logits = (2.0 * c - 1.0) * 8.0
    np.testing.assert_array_equal(np.asarray(dec(jnp.asarray(logits))), u)


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


@pytest.mark.parametrize("mode,early_stop,num_iter", [
    ("minsum", True, 20),
    ("minsum", True, 21),   # remainder chunk (num_iter % check_every != 0)
    ("minsum", False, 12),
    ("exact", True, 12),
])
def test_bp_pallas_equals_xla(mode, early_stop, num_iter):
    """The fused whole-decode Pallas kernel (pallas_bp.py, interpret mode
    on CPU) must be bit-identical to the XLA engine — same rowwise values,
    same freeze-chunk early-stop semantics."""
    n, k = 128, 64
    frozen, logits, _u = _noisy_fixture(n, k, bs=256, seed=11)
    kw = dict(num_iter=num_iter, mode=mode, early_stop=early_stop,
              hard_out=False)
    ref = PolarBPDecoder(frozen, n, use_pallas=False, **kw)
    ker = PolarBPDecoder(frozen, n, use_pallas=True, **kw)
    a = np.asarray(ref(jnp.asarray(logits)))
    b = np.asarray(ker(jnp.asarray(logits)))
    np.testing.assert_array_equal(a, b)


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


def test_bp_auto_falls_back_when_kernel_cannot_fit(monkeypatch):
    """Auto engine selection must fall back to XLA (not raise) when the
    fused kernel's message lattice cannot fit scoped VMEM at any legal
    batch tile — n=2048 exceeds the 16 MiB budget even at tb=128."""
    import jax
    from polar_tpu.models.polar.construction import generate_rm_code
    frozen, _info, n, k, _d = generate_rm_code(7, 11)  # n=2048
    dec = PolarBPDecoder(frozen, n, num_iter=2)
    # pretend we are on a TPU (and opt into the kernel, r4 default-off)
    # so the auto branch considers it
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("POLAR_TPU_BP_KERNEL", "1")
    out = dec(jnp.zeros((128, n), jnp.float32))
    assert out.shape == (128, k)


# ----------------------------------------------------------------------
# two-pass serving path (r4): cheap first pass + compacted full-budget
# re-decode of the failures must be BIT-identical to the single-pass
# early-stop decoder (BP has no cross-lane coupling and the re-decode
# replays the same sweep/freeze trajectory)
# ----------------------------------------------------------------------
@pytest.mark.parametrize("hard_out", [True, False])
def test_bp_two_pass_bit_identical(hard_out):
    n, k = 128, 64
    frozen, logits, _ = _noisy_fixture(n, k, ebno_db=1.0, bs=96, seed=3)
    kw = dict(num_iter=10, check_every=2, hard_out=hard_out)
    one = PolarBPDecoder(frozen, n, **kw)
    two = PolarBPDecoder(frozen, n, two_pass=True, first_pass_iters=4,
                         min_capacity=8, **kw)
    x = jnp.asarray(logits)
    np.testing.assert_array_equal(np.asarray(one(x)), np.asarray(two(x)))


def test_bp_two_pass_pipelined_matches_per_batch():
    n, k = 128, 64
    frozen, logits, _ = _noisy_fixture(n, k, ebno_db=1.0, bs=192, seed=7)
    dec = PolarBPDecoder(frozen, n, num_iter=8, two_pass=True,
                         first_pass_iters=4, min_capacity=8)
    batches = [jnp.asarray(logits[:64]), jnp.asarray(logits[64:])]
    outs = dec.decode_pipelined(batches, scl_batch=64)
    per = [np.asarray(dec(b)) for b in batches]
    for o, p in zip(outs, per):
        np.testing.assert_array_equal(np.asarray(o), p)


def test_bp_two_pass_all_converged_noiseless():
    n, k = 64, 32
    frozen, _ = generate_5g_ranking(k, n)
    enc = PolarEncoder(frozen, n)
    rng = np.random.default_rng(11)
    u = rng.integers(0, 2, size=(32, k)).astype(np.float32)
    c = np.asarray(enc(jnp.asarray(u)))
    logits = jnp.asarray(12.0 * (2.0 * c - 1.0))
    dec = PolarBPDecoder(frozen, n, num_iter=10, two_pass=True,
                         first_pass_iters=4, min_capacity=8)
    np.testing.assert_array_equal(np.asarray(dec(logits)), u)
