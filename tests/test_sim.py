"""Monte-Carlo harness tests: counters, status codes, early stop,
checkpoint/resume, JSONL metrics, and system-model round trips."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from polar_tpu.sim import (sim_ber, count_errors, count_block_errors,
                           hard_decisions)
from polar_tpu.models.systems import SystemAWGNModel, SystemBECModel
from polar_tpu.models.no_code import NoEncoder, NoDecoder
from polar_tpu.models.polar.encode import PolarEncoder
from polar_tpu.models.polar.sc import PolarSCDecoder
from polar_tpu.models.polar.construction import generate_5g_ranking


def test_count_errors():
    a = jnp.asarray([[0., 1., 1.], [0., 0., 0.]])
    b = jnp.asarray([[0., 0., 1.], [1., 1., 1.]])
    assert int(count_errors(a, b)) == 4
    assert int(count_block_errors(a, b)) == 2
    assert int(count_block_errors(a, a)) == 0


def test_hard_decisions():
    llr = jnp.asarray([-1.0, 0.0, 2.5])
    np.testing.assert_array_equal(np.asarray(hard_decisions(llr)),
                                  [0.0, 0.0, 1.0])


class _PerfectModel:
    """b == b_hat always (zero errors)."""
    def step(self, key, batch_size, ebno_db):
        b = jax.random.bernoulli(key, 0.5, (batch_size, 8)).astype(jnp.float32)
        return b, b


class _BrokenModel:
    """Every bit wrong."""
    def step(self, key, batch_size, ebno_db):
        b = jnp.zeros((batch_size, 8), jnp.float32)
        return b, 1.0 - b


def test_sim_ber_early_stop_status():
    ber, bler = sim_ber(_PerfectModel(), [0.0, 1.0, 2.0], batch_size=4,
                        max_mc_iter=3, verbose=False)
    # first point error-free -> early stop, remaining points not simulated
    assert ber[0] == 0.0
    assert bler.shape == (3,)
    assert np.all(ber[1:] == 0.0)  # NaN->0 for unsimulated points


def test_sim_ber_target_block_errors():
    ber, bler = sim_ber(_BrokenModel(), [0.0], batch_size=10,
                        max_mc_iter=100, target_block_errs=25,
                        verbose=False)
    assert bler[0] == 1.0 and ber[0] == 1.0


def test_sim_ber_checkpoint_resume(tmp_path):
    state = str(tmp_path / "sweep.npz")
    jsonl = str(tmp_path / "metrics.jsonl")
    ber1, _ = sim_ber(_BrokenModel(), [0.0, 1.0], batch_size=4,
                      max_mc_iter=2, verbose=False, state_path=state,
                      jsonl_path=jsonl, early_stop=False)
    assert os.path.exists(state)
    # resume: completed points must not be re-simulated
    with np.load(state) as st:
        assert int(st["next_point"]) == 2
        nb_before = st["nb_bits"].copy()
    ber2, _ = sim_ber(_BrokenModel(), [0.0, 1.0], batch_size=4,
                      max_mc_iter=2, verbose=False, state_path=state,
                      early_stop=False)
    with np.load(state) as st:
        np.testing.assert_array_equal(st["nb_bits"], nb_before)
    lines = [json.loads(l) for l in open(jsonl)]
    assert len(lines) == 2
    assert lines[0]["block_errors"] == lines[0]["num_blocks"]


def test_sim_ber_reproducible_seed():
    k, n = 16, 32
    frozen, _ = generate_5g_ranking(k, n)
    model = SystemAWGNModel(n, k, PolarEncoder(frozen, n),
                            PolarSCDecoder(frozen, n))
    r1 = sim_ber(model, [2.0], batch_size=64, max_mc_iter=3, seed=7,
                 verbose=False)
    r2 = sim_ber(model, [2.0], batch_size=64, max_mc_iter=3, seed=7,
                 verbose=False)
    np.testing.assert_array_equal(r1[0], r2[0])
    np.testing.assert_array_equal(r1[1], r2[1])


def test_awgn_system_uncoded_ber_matches_theory():
    # uncoded QPSK over AWGN: BER = Q(sqrt(2 Eb/N0))
    from scipy.stats import norm
    n = 128
    model = SystemAWGNModel(n, n, NoEncoder(), NoDecoder())
    ebno_db = 4.0
    ber, _ = sim_ber(model, [ebno_db], batch_size=2000, max_mc_iter=10,
                     early_stop=False, verbose=False)
    want = norm.sf(np.sqrt(2 * 10 ** (ebno_db / 10)))
    assert abs(ber[0] - want) / want < 0.15


def test_bec_system_roundtrip():
    k, n = 16, 32
    frozen, _ = generate_5g_ranking(k, n)
    model = SystemBECModel(n, k, PolarEncoder(frozen, n),
                           PolarSCDecoder(frozen, n))
    # erasure probability 0 -> error-free
    b, b_hat = model(jax.random.PRNGKey(0), 32, 0.0)
    np.testing.assert_array_equal(np.asarray(b), np.asarray(b_hat))


def test_cw_estimates_mode():
    k, n = 16, 32
    frozen, _ = generate_5g_ranking(k, n)
    enc = PolarEncoder(frozen, n)
    model = SystemAWGNModel(n, k, enc, PolarSCDecoder(frozen, n),
                            cw_estimates=True)
    cw, b_hat = model(jax.random.PRNGKey(0), 8, 20.0)
    assert cw.shape == (8, n) and b_hat.shape == (8, k)
    assert bool(jnp.all(enc.parity_check(cw)))
