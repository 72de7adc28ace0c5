"""Multi-chip tests on a virtual 8-device CPU mesh (SURVEY.md section 4,
test pyramid item d): sharded execution must compile, run, and produce the
same statistics as single-device execution with the same folded keys."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from polar_tpu.parallel import make_mesh, ShardedSystem
from polar_tpu.sim import sim_ber, count_errors, count_block_errors
from polar_tpu.models.systems import SystemAWGNModel
from polar_tpu.models.polar.encode import PolarEncoder
from polar_tpu.models.polar.sc import PolarSCDecoder
from polar_tpu.models.polar.scl import PolarSCLDecoder
from polar_tpu.models.polar.construction import generate_5g_ranking


def _model(k=16, n=32, decoder="sc"):
    frozen, _ = generate_5g_ranking(k, n)
    enc = PolarEncoder(frozen, n)
    dec = (PolarSCDecoder(frozen, n) if decoder == "sc"
           else PolarSCLDecoder(frozen, n, list_size=4))
    return SystemAWGNModel(n, k, enc, dec)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8  # conftest forces 8 virtual CPU devices


@pytest.mark.parametrize("decoder", ["sc", "scl"])
def test_sharded_equals_manual_shards(decoder):
    """psum-reduced counters == manually summing each shard's chain."""
    model = _model(decoder=decoder)
    mesh = make_mesh(8)
    sharded = ShardedSystem(model, mesh)
    key = jax.random.PRNGKey(0)
    bs = 64
    bit_e, blk_e, nb, nblk = sharded.counted_step(key, bs, jnp.float32(2.0))
    assert nb == bs * model.k and nblk == bs

    want_bit = want_blk = 0
    for shard in range(8):
        k_s = jax.random.fold_in(key, shard)
        b, b_hat = model.step(k_s, bs // 8, jnp.float32(2.0))
        want_bit += int(count_errors(b, b_hat))
        want_blk += int(count_block_errors(b, b_hat))
    assert int(bit_e) == want_bit
    assert int(blk_e) == want_blk


def test_sharded_sim_ber_runs_and_is_reproducible():
    model = _model()
    sharded = ShardedSystem(model, make_mesh(8))
    r1 = sim_ber(sharded, [1.0, 3.0], batch_size=128, max_mc_iter=3,
                 seed=3, verbose=False)
    r2 = sim_ber(sharded, [1.0, 3.0], batch_size=128, max_mc_iter=3,
                 seed=3, verbose=False)
    np.testing.assert_array_equal(r1[0], r2[0])
    np.testing.assert_array_equal(r1[1], r2[1])
    assert np.all(r1[0] >= 0) and np.all(r1[0] <= 1)


class _CrnUnsharded:
    """Common-random-numbers twin of ShardedSystem: one device, but the
    batch is split into the same per-shard folded key streams, so the
    sharded sweep must reproduce it EXACTLY (not just within MC noise)."""

    def __init__(self, model, num_shards):
        self.model = model
        self.num_shards = num_shards

    def step(self, key, batch_size, ebno_db):
        local = batch_size // self.num_shards
        outs = [self.model.step(jax.random.fold_in(key, s), local, ebno_db)
                for s in range(self.num_shards)]
        return (jnp.concatenate([o[0] for o in outs]),
                jnp.concatenate([o[1] for o in outs]))


def test_sharded_statistics_match_unsharded():
    """Sharded sweep == single-device sweep under common random numbers."""
    model = _model()
    sharded = ShardedSystem(model, make_mesh(8))
    ber_s, bler_s = sim_ber(sharded, [1.0, 2.0], batch_size=512,
                            max_mc_iter=4, seed=11, verbose=False,
                            early_stop=False)
    ber_u, bler_u = sim_ber(_CrnUnsharded(model, 8), [1.0, 2.0],
                            batch_size=512, max_mc_iter=4, seed=11,
                            verbose=False, early_stop=False)
    np.testing.assert_array_equal(ber_s, ber_u)
    np.testing.assert_array_equal(bler_s, bler_u)


def test_sharded_rejects_indivisible_batch():
    sharded = ShardedSystem(_model(), make_mesh(8))
    with pytest.raises(AssertionError):
        sharded.counted_step(jax.random.PRNGKey(0), 12, jnp.float32(1.0))


def test_mesh_subset():
    mesh = make_mesh(4)
    assert mesh.devices.size == 4
    sharded = ShardedSystem(_model(), mesh)
    out = sharded.counted_step(jax.random.PRNGKey(1), 32, jnp.float32(2.0))
    assert len(out) == 4


@pytest.mark.parametrize("decoder", ["sc", "scl"])
def test_scan_engine_under_shard_map(decoder):
    """Regression: the lax.scan sweep engines trace under shard_map.

    The scan carries are built from constants, which are *unvarying* in
    shard_map's varying-manual-axes type system, while llr-derived branch
    outputs are varying — lax.switch/cond used to fail with "switch
    branches must have equal output types" (scan_core._pvary_like seeds
    the carries as varying). n=256 >= SCAN_THRESHOLD_N forces the scan
    engine; counters must equal the manual per-shard run bit-for-bit."""
    k, n = 128, 256
    frozen, _ = generate_5g_ranking(k, n)
    dec = (PolarSCDecoder(frozen, n, schedule="scan") if decoder == "sc"
           else PolarSCLDecoder(frozen, n, list_size=4, schedule="scan"))
    assert dec.schedule == "scan"
    model = SystemAWGNModel(n, k, PolarEncoder(frozen, n), dec)
    sharded = ShardedSystem(model, make_mesh(8))
    key = jax.random.PRNGKey(7)
    bs = 32
    bit_e, blk_e, nb, nblk = sharded.counted_step(key, bs, jnp.float32(2.0))
    assert nb == bs * k and nblk == bs

    want_bit = want_blk = 0
    for shard in range(8):
        b, b_hat = model.step(jax.random.fold_in(key, shard), bs // 8,
                              jnp.float32(2.0))
        want_bit += int(count_errors(b, b_hat))
        want_blk += int(count_block_errors(b, b_hat))
    assert int(bit_e) == want_bit
    assert int(blk_e) == want_blk


def test_scan_outer_switch_under_shard_map():
    """Same regression, for the hybrid engine's *scan-outer* path.

    At n=256 with the conftest's b=3 the outer sweep has m=5 super-stages
    and unrolls (no lax.switch) — the case above covers it. Here
    n=4096 -> m=9 > scan_core.UNROLL_OUTER_MAX_M, so the outer sweep runs
    as lax.scan over lax.switch rise-branches, the construct the vma
    seeding exists for."""
    from polar_tpu.models.polar.scan_core import (UNROLL_OUTER_MAX_M,
                                                  resolve_lower_stages)

    from polar_tpu.models.polar.construction import get_kern_frozen_bits
    from polar_tpu.models.polar.kernels import ARIKAN_F2

    k, n = 2048, 4096
    _, _, frozen = get_kern_frozen_bits(n, n - k, ARIKAN_F2)
    # conftest pins POLAR_TPU_LOWER_STAGES=3 -> m = 12 - 3 = 9 > 8
    S = n.bit_length() - 1
    b = resolve_lower_stages(S, 16, use_pallas=False)
    assert S - b > UNROLL_OUTER_MAX_M, (S, b)
    dec = PolarSCDecoder(frozen, n, schedule="scan")
    model = SystemAWGNModel(n, k, PolarEncoder(frozen, n), dec)
    sharded = ShardedSystem(model, make_mesh(8))
    key = jax.random.PRNGKey(11)
    bs = 16
    bit_e, blk_e, nb, nblk = sharded.counted_step(key, bs, jnp.float32(2.5))
    assert nb == bs * k and nblk == bs

    want_bit = want_blk = 0
    for shard in range(8):
        b, b_hat = model.step(jax.random.fold_in(key, shard), bs // 8,
                              jnp.float32(2.5))
        want_bit += int(count_errors(b, b_hat))
        want_blk += int(count_block_errors(b, b_hat))
    assert int(bit_e) == want_bit
    assert int(blk_e) == want_blk
