"""Tests for the kernel zoo, profiling/complexity meter, and numerics."""

import numpy as np
import jax.numpy as jnp
import pytest

from polar_tpu.models.polar.kernels import (
    KERNELS, get_kernel, arikan_power, bit_reversed_kernel,
    weight_sorted_kernel, row_weights)
from polar_tpu.models.polar.construction import get_kern_frozen_bits
from polar_tpu.utils.profiling import decode_complexity, flop_estimate
from polar_tpu.utils.numerics import int_mod_2, expand_to_rank, insert_dims


def test_kernel_registry():
    np.testing.assert_array_equal(get_kernel("F2"), [[1, 0], [1, 1]])
    for name in ("F4", "F8", "F16", "F32", "B8", "W8"):
        g = get_kernel(name)
        n = int(name[1:])
        assert g.shape == (n, n)
        # all kernels must be invertible over GF(2) (det odd)
        assert round(abs(np.linalg.det(g))) % 2 == 1
    with pytest.raises(KeyError):
        get_kernel("nope")


def test_bit_reversed_is_permutation_of_arikan():
    g = arikan_power(16)
    b = bit_reversed_kernel(16)
    assert sorted(map(tuple, g.tolist())) == sorted(map(tuple, b.tolist()))
    w = weight_sorted_kernel(16)
    assert (np.diff(row_weights(w)) >= 0).all()


def test_kern_frozen_bits_accepts_zoo_kernels():
    g, w, frozen = get_kern_frozen_bits(16, 8, get_kernel("F4"))
    assert len(frozen) == 8 and g.shape == (16, 16)


def test_decode_complexity():
    c = decode_complexity(64, 32, 8)
    assert c.f_ops == 32 * 6 * 8
    assert c.sort_ops == 32
    assert c.total() > 0
    d = c.as_dict()
    assert d["total"] == c.total()
    assert decode_complexity(64, 32, 1).sort_ops == 0


def test_decode_complexity_fast():
    import numpy as np
    from polar_tpu.models.polar.construction import generate_5g_ranking
    frozen, _ = generate_5g_ranking(32, 64)
    mask = np.zeros(64, bool)
    mask[frozen] = True
    plain = decode_complexity(64, 32, 8)
    fast = decode_complexity(64, 32, 8, frozen_mask=mask, fast=True)
    # pruning removes descent/rise work below rate-0/rep roots
    assert fast.f_ops < plain.f_ops
    assert fast.xor_ops < plain.xor_ops
    # every fork is an info leaf or a repetition node; reps absorb >= 0
    assert 0 < fast.sort_ops <= plain.sort_ops
    # an all-info code has nothing to prune: plain and fast agree on f/g
    nomask = np.zeros(64, bool)
    allinfo = decode_complexity(64, 64, 8, frozen_mask=nomask, fast=True)
    assert allinfo.f_ops == plain.f_ops and allinfo.g_ops == plain.g_ops


def test_flop_estimate_runs():
    est = flop_estimate(lambda x: jnp.dot(x, x), jnp.ones((64, 64)))
    assert est > 0 or np.isnan(est)  # backend-dependent availability


def test_numerics():
    x = jnp.asarray([0.0, 1.0, 2.0, 3.0])
    np.testing.assert_array_equal(np.asarray(int_mod_2(x)), [0, 1, 0, 1])
    assert expand_to_rank(jnp.ones((3,)), 3, axis=0).shape == (1, 1, 3)
    assert insert_dims(jnp.ones((2, 3)), 2, axis=1).shape == (2, 1, 1, 3)
