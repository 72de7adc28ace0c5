"""Constellation / Mapper / Demapper tests vs reference fixtures and
analytic properties."""

import numpy as np
import jax.numpy as jnp
import pytest

from polar_tpu.ops.mapping import Constellation, Mapper, Demapper, qam
from polar_tpu.ops.ebno import ebnodb2no


@pytest.mark.parametrize("m", [2, 4])
def test_constellation_matches_reference(mapping_fix, m):
    pts = np.asarray(Constellation(m).points)
    np.testing.assert_allclose(pts, mapping_fix[f"qam{m}_points"],
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("m", [2, 4, 6])
def test_constellation_unit_power(m):
    pts = qam(m, normalize=True)
    assert abs(np.mean(np.abs(pts) ** 2) - 1.0) < 1e-6


@pytest.mark.parametrize("m", [2, 4])
def test_mapper_matches_reference(mapping_fix, m):
    bits = mapping_fix[f"qam{m}_bits"]
    x = Mapper(Constellation(m))(jnp.asarray(bits))
    np.testing.assert_allclose(np.asarray(x), mapping_fix[f"qam{m}_x"],
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("m", [2, 4])
def test_demapper_matches_reference(mapping_fix, m):
    y = jnp.asarray(mapping_fix[f"qam{m}_y"])
    no = float(mapping_fix[f"qam{m}_no"])
    llr = Demapper(Constellation(m))((y, no))
    np.testing.assert_allclose(np.asarray(llr), mapping_fix[f"qam{m}_llr"],
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("m", [2, 4])
def test_map_demap_roundtrip(m):
    rng = np.random.default_rng(7)
    bits = rng.integers(0, 2, size=(32, 12 * m)).astype(np.float32)
    c = Constellation(m)
    x = Mapper(c)(jnp.asarray(bits))
    llr = Demapper(c)((x, 1e-3))  # (almost) noiseless
    hard = np.asarray(llr > 0, dtype=np.float32)
    np.testing.assert_array_equal(hard, bits)


def test_maxlog_close_to_app_at_high_snr():
    rng = np.random.default_rng(11)
    bits = rng.integers(0, 2, size=(8, 16)).astype(np.float32)
    c = Constellation(4)
    x = Mapper(c)(jnp.asarray(bits))
    no = 0.01
    app = np.asarray(Demapper(c, method="app")((x, no)))
    mlg = np.asarray(Demapper(c, method="maxlog")((x, no)))
    assert np.all(np.sign(app) == np.sign(mlg))


def test_ebnodb2no():
    # k/n = 1/2, QPSK (2 bit/sym): No = 1/(ebno * 0.5 * 2) = 1/ebno
    no = float(ebnodb2no(3.0, 2, 0.5))
    assert abs(no - 10 ** (-0.3)) < 1e-6
