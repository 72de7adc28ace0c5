"""Channel model tests: AWGN statistics, BEC/BSC behavior and
differentiability (the Gumbel-STE capability inherited from the reference,
`my_sn/trans/channel/discrete_channel.py:56-75`)."""

import numpy as np
import jax
import jax.numpy as jnp

from polar_tpu.ops.channels import (AWGN, BinaryErasureChannel,
                                    BinarySymmetricChannel, complex_normal)


def test_complex_normal_stats():
    key = jax.random.PRNGKey(0)
    x = complex_normal(key, (200_000,), var=2.0)
    assert abs(float(jnp.mean(jnp.abs(x) ** 2)) - 2.0) < 0.05
    assert abs(float(jnp.mean(x.real))) < 0.02


def test_awgn_noise_power():
    key = jax.random.PRNGKey(1)
    x = jnp.ones((100_000,), dtype=jnp.complex64)
    no = 0.5
    y = AWGN()(key, (x, no))
    err = y - x
    assert abs(float(jnp.mean(jnp.abs(err) ** 2)) - no) < 0.02


def test_bec_llr_outputs():
    key = jax.random.PRNGKey(2)
    x = jnp.asarray(np.random.default_rng(0).integers(0, 2, 50_000),
                    dtype=jnp.float32)
    ch = BinaryErasureChannel(return_llrs=True, llr_max=20.0)
    pe = 0.3
    y = np.asarray(ch(key, (x, pe)))
    frac_erased = np.mean(y == 0.0)
    assert abs(frac_erased - pe) < 0.02
    live = y != 0
    np.testing.assert_array_equal(y[live] > 0, np.asarray(x)[live] == 1)
    assert set(np.unique(np.abs(y))) <= {0.0, 20.0}


def test_bec_ternary_output():
    key = jax.random.PRNGKey(3)
    x = jnp.asarray([0.0, 1.0] * 1000)
    y = np.asarray(BinaryErasureChannel()(key, (x, 0.5)))
    assert set(np.unique(y)) <= {-1.0, 0.0, 1.0}


def test_bsc_flip_rate():
    key = jax.random.PRNGKey(4)
    x = jnp.zeros(50_000, dtype=jnp.float32)
    y = np.asarray(BinarySymmetricChannel()(key, (x, 0.1)))
    assert abs(np.mean(y) - 0.1) < 0.01


def test_bec_is_differentiable():
    # gradient must flow through the Gumbel-softmax error sampling
    key = jax.random.PRNGKey(5)
    ch = BinaryErasureChannel(return_llrs=True)

    def loss(pe):
        x = jnp.ones(256, dtype=jnp.float32)
        return jnp.sum(ch(key, (x, pe)) ** 2)

    g = jax.grad(loss)(0.3)
    assert np.isfinite(float(g)) and float(g) != 0.0
