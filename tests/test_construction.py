"""Known-answer tests for host-side code construction (frozen sets, RM,
kernel row weights) against fixtures generated from the reference
(`my_sn/fec/polar/utils.py`, `x_run_sn_polar/polar/froze.py`)."""

import numpy as np
import pytest

from polar_tpu.models.polar.construction import (
    generate_5g_ranking, generate_rm_code, get_kern_frozen_bits,
    gen_arikan, ARIKAN_F2, info_positions)


@pytest.mark.parametrize("k,n", [(32, 64), (12, 32), (100, 256),
                                 (512, 1024), (37, 128)])
def test_5g_ranking_matches_reference(construction_fix, k, n):
    frozen, info = generate_5g_ranking(k, n)
    np.testing.assert_array_equal(
        frozen, construction_fix[f"rank_k{k}_n{n}_frozen"])
    np.testing.assert_array_equal(
        info, construction_fix[f"rank_k{k}_n{n}_info"])


def test_5g_ranking_properties():
    for (k, n) in ((16, 32), (128, 512), (1024, 1024)):
        frozen, info = generate_5g_ranking(k, n)
        assert len(frozen) == n - k and len(info) == k
        assert len(np.intersect1d(frozen, info)) == 0
        assert np.union1d(frozen, info).shape[0] == n


def test_5g_ranking_bounds():
    with pytest.raises(AssertionError):
        generate_5g_ranking(10, 2048)
    with pytest.raises(AssertionError):
        generate_5g_ranking(65, 64)


@pytest.mark.parametrize("r,m", [(1, 3), (2, 5), (3, 7)])
def test_rm_code_matches_reference(construction_fix, r, m):
    frozen, info, n, k, d = generate_rm_code(r, m)
    np.testing.assert_array_equal(
        frozen, construction_fix[f"rm_r{r}_m{m}_frozen"])
    np.testing.assert_array_equal(
        [n, k, d], construction_fix[f"rm_r{r}_m{m}_meta"])


def test_kron_kernel():
    g = gen_arikan(ARIKAN_F2, 2)
    np.testing.assert_array_equal(
        g, [[1, 0, 0, 0], [1, 1, 0, 0], [1, 0, 1, 0], [1, 1, 1, 1]])


def test_kern_frozen_bits():
    g, w, frozen = get_kern_frozen_bits(8, 4, ARIKAN_F2)
    # row weights of F2^{x3}: [1,2,2,4,2,4,4,8]; freeze 4 lowest (stable)
    np.testing.assert_array_equal(w, [1, 2, 2, 4, 2, 4, 4, 8])
    np.testing.assert_array_equal(frozen, [0, 1, 2, 4])


def test_info_positions():
    np.testing.assert_array_equal(info_positions([0, 1, 2, 4], 8),
                                  [3, 5, 6, 7])
