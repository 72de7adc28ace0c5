"""Test configuration: force CPU with 8 virtual devices so the multi-chip
sharding tests (SURVEY.md section 4 test pyramid, item d) run anywhere.

TPU lane: ``POLAR_TPU_TEST_TPU=1 python -m pytest tests -m tpu`` keeps the
real TPU backend and runs only the ``@pytest.mark.tpu`` modules (compiled
Pallas-vs-XLA equality — the check that would have caught the round-1
Mosaic L=16 regression automatically). Without the env var those tests
auto-skip and everything else runs on the CPU mesh as before."""

import os

TPU_LANE = os.environ.get("POLAR_TPU_TEST_TPU") == "1"

if not TPU_LANE:
    # must happen before jax initializes a backend; the environment may pin
    # JAX_PLATFORMS to a TPU plugin globally (and plugin registration can
    # override the env var via jax.config), so force the config explicitly
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

# persistent XLA compile cache: repeat test runs skip recompilation
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/polar_tpu_xla_tests"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
# smaller unrolled subtrees in the scan decode engines: ~3x faster XLA-CPU
# compiles, bit-identical outputs (see scan_core.DEFAULT_LOWER_STAGES)
os.environ.setdefault("POLAR_TPU_LOWER_STAGES", "3")

import jax

if not TPU_LANE:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: needs the real TPU chip (POLAR_TPU_TEST_TPU=1 pytest -m tpu)")
    config.addinivalue_line(
        "markers",
        "slow: long cold-compile cases, opt-in via -m 'tpu and slow'")


# Quick-lane registry (POLAR_TPU_TEST_QUICK=1): the measured slowest tests
# of the full CPU suite (>= ~14 s each, re-measured 2026-08-19 r5: full
# suite 36m42s warm-cache on this 1-CPU container — top-12 tests are 38%
# of the wall-clock, all trace/interpret-bound, so pytest-xdist (installed
# but useless on one core) and batch shrinking don't help; quick lane
# ~8-10 min). NOTHING is deleted: the full suite (default) still runs
# every test; quick is the dev loop.
_QUICK_SKIP = {
    "test_bp_bf16_messages_close_to_f32",
    "test_5g_crc_status",
    "test_5g_downlink_roundtrip[30-120-SCL]",
    "test_5g_scl_decoder_matches_reference[32-140]",
    "test_bp_close_to_sc_at_moderate_snr",
    "test_bp_large_n_in_sc_class[1024]",
    "test_bp_large_n_in_sc_class[256]",
    "test_bp_pallas_equals_xla[exact-True-12]",
    "test_bp_pallas_equals_xla[minsum-True-20]",
    "test_bp_pallas_equals_xla[minsum-True-21]",
    "test_fast_hybrid_equals_unrolled_fast[exact-3]",
    "test_fast_hybrid_equals_unrolled_fast[exact-4]",
    "test_fast_hybrid_equals_unrolled_fast[minsum-3]",
    "test_fast_hybrid_equals_unrolled_fast[minsum-4]",
    "test_fast_hybrid_random_masks_equal_unrolled",
    "test_fast_pallas_blocked_subtree_equals_unrolled_fast",
    "test_fast_pallas_subtree_equals_unrolled_fast",
    "test_fast_scl_equals_plain_scl",
    "test_ga_code_decodes_at_design_snr",
    "test_hybrid_failed_blocks_bit_equal_ca_scl",
    "test_hybrid_in_sim_ber",
    "test_hybrid_pipelined_matches_per_batch",
    "test_hybrid_scan_engine_parity",
    "test_hybrid_sweeps_equal_plain[1]",
    "test_hybrid_sweeps_equal_plain[3]",
    "test_hybrid_sweeps_equal_plain[5]",
    "test_pallas_blocked_subtree_equals_xla",
    "test_pallas_static_subtree_equals_xla",
    "test_pallas_subtree_equals_xla[4]",
    "test_pallas_subtree_equals_xla[8]",
    "test_pc_crc_status_works",
    "test_pc_improves_over_no_pc_scl",
    "test_polar5g_hybscl",
    "test_polar5g_pipelined_matches_per_batch",
    "test_sc_rate0_pruned_kernel_equals_plain",
    "test_sc_roundtrip_noiseless[128-exact]",
    "test_sc_scan_equals_unrolled[128-exact]",
    "test_scan_engine_under_shard_map[sc]",
    "test_scan_engine_under_shard_map[scl]",
    "test_scan_outer_switch_under_shard_map",
    "test_scl1_equals_sc[exact]",
    "test_scl_constructor_delegates_hybrid",
    "test_scl_decoder_fast_scan_routes_to_pruned_sweep",
    "test_scl_exact_matches_reference[256-4]",
    "test_scl_exact_matches_reference[256-8]",
    "test_scl_minsum_matches_reference[64]",
    "test_scl_scan_equals_unrolled[128-1]",
    "test_scl_scan_equals_unrolled[128-4]",
    "test_scl_scan_with_crc_matches_unrolled",
    "test_sharded_equals_manual_shards[scl]",
    "test_two_process_counters_match_single_process",
    "test_bp_two_pass_pipelined_matches_per_batch",
}


def pytest_collection_modifyitems(config, items):
    if not TPU_LANE and os.environ.get("POLAR_TPU_TEST_QUICK") == "1":
        skip_q = pytest.mark.skip(
            reason="quick lane skips measured-slow tests "
                   "(full suite runs them)")
        for item in items:
            if item.nodeid.split("::")[-1] in _QUICK_SKIP:
                item.add_marker(skip_q)
    if TPU_LANE:
        if os.environ.get("POLAR_TPU_TEST_SLOW") != "1":
            skip_slow = pytest.mark.skip(
                reason="slow cold-compile case (set POLAR_TPU_TEST_SLOW=1)")
            for item in items:
                if "slow" in item.keywords:
                    item.add_marker(skip_slow)
        return
    skip = pytest.mark.skip(
        reason="TPU lane disabled (set POLAR_TPU_TEST_TPU=1)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)


FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")


def load_fixture(name):
    path = os.path.join(FIXTURE_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"fixture {name} not generated (run tests/make_fixtures.py)")
    return np.load(path)


@pytest.fixture(scope="session")
def decoders_fix():
    return load_fixture("decoders.npz")


@pytest.fixture(scope="session")
def construction_fix():
    return load_fixture("construction.npz")


@pytest.fixture(scope="session")
def crc_fix():
    return load_fixture("crc.npz")


@pytest.fixture(scope="session")
def mapping_fix():
    return load_fixture("mapping.npz")


@pytest.fixture(scope="session")
def polar5g_fix():
    return load_fixture("polar5g.npz")


@pytest.fixture(scope="session")
def osd_fix():
    return load_fixture("osd.npz")
