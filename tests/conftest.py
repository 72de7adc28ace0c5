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


def pytest_collection_modifyitems(config, items):
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
