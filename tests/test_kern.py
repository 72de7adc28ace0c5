"""Dense-G kernel chain: encoder parity, GF(2) inverse, OSD decode,
and the --kern CLI wiring (VERDICT r3 task 6).

Reference anchors: ``x_run_sn_polar/polar/enc.py:30-43`` (dense matmul
encoder over any kernel), ``x_run_sn_polar/polar/froze.py:4-16``
(row-weight construction for any kernel)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from polar_tpu.models.polar.construction import (
    get_kern_frozen_bits, ARIKAN_F2)
from polar_tpu.models.polar.dense import (
    DenseKernelEncoder, DenseKernelDecoder, gf2_inv)
from polar_tpu.models.polar.kernels import get_kernel
from polar_tpu.models.polar.encode import PolarEncoder


@pytest.mark.parametrize("name,n", [("F2", 16), ("K8", 8), ("G16", 16),
                                    ("K16", 16), ("R4", 16)])
def test_dense_encoder_matches_matmul(name, n):
    kern = get_kernel(name)
    k = n // 2
    g, _, frozen_pos = get_kern_frozen_bits(n, n - k, kern)
    enc = DenseKernelEncoder(frozen_pos, n, kern)
    rng = np.random.default_rng(0)
    u = rng.integers(0, 2, size=(5, k)).astype(np.float32)
    # reference semantics: scatter into non-frozen positions, c = u @ G % 2
    c_full = np.zeros((5, n), dtype=np.int64)
    c_full[:, enc.info_pos] = u.astype(np.int64)
    want = (c_full @ g) % 2
    got = np.asarray(enc(jnp.asarray(u)))
    np.testing.assert_array_equal(got, want)


def test_dense_f2_equals_butterfly_encoder():
    n, k = 64, 32
    _, _, frozen_pos = get_kern_frozen_bits(n, n - k, ARIKAN_F2)
    dense = DenseKernelEncoder(frozen_pos, n, ARIKAN_F2)
    butterfly = PolarEncoder(frozen_pos, n)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.integers(0, 2, size=(7, k)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(dense(u)),
                                  np.asarray(butterfly(u)))


@pytest.mark.parametrize("name", ["F2", "K8", "G16", "G32"])
def test_gf2_inv_roundtrip(name):
    kern = (get_kernel(name).astype(np.int64)) & 1
    inv = gf2_inv(kern)
    eye = (kern @ inv) % 2
    np.testing.assert_array_equal(eye, np.eye(kern.shape[0], dtype=np.int64))


def test_gf2_inv_singular_raises():
    with pytest.raises(ValueError):
        gf2_inv(np.array([[1, 1], [1, 1]]))


@pytest.mark.parametrize("name,n", [("G16", 16), ("K8", 8)])
def test_dense_decoder_noiseless_roundtrip(name, n):
    kern = get_kernel(name)
    k = n // 2
    _, _, frozen_pos = get_kern_frozen_bits(n, n - k, kern)
    enc = DenseKernelEncoder(frozen_pos, n, kern)
    dec = DenseKernelDecoder(enc, t=1)
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.integers(0, 2, size=(16, k)).astype(np.float32))
    c = enc(u)
    # noiseless logits: llr > 0 -> bit 1
    llr = jnp.asarray(8.0 * (2.0 * np.asarray(c) - 1.0))
    u_hat = dec(llr)
    np.testing.assert_array_equal(np.asarray(u_hat), np.asarray(u))


def test_kern_cli_sweep(tmp_path, capsys):
    """--kern K16 runs an end-to-end sweep (VERDICT r3 task 6 'done')."""
    from polar_tpu.config import PolarConfig
    from polar_tpu.main import main
    c = PolarConfig(k=8, n=16, kern="K16", bs=32, mc_iter=1,
                    snr_end=1.0, osd_t=1, plot_dir=str(tmp_path))
    main(c)
    out = capsys.readouterr().out
    assert "K16 OSD-1" in out
    assert any(p.suffix == ".png" for p in tmp_path.iterdir())


def test_kern_cli_rejects_f2_only_construction():
    from polar_tpu.config import PolarConfig
    from polar_tpu.main import gen_code
    c = PolarConfig(k=8, n=16, kern="K16", construction="5g")
    with pytest.raises(ValueError, match="F2-only"):
        gen_code(c, "x", mode="osd")
