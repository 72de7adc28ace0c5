"""The import-time axon-relay preflight (polar_tpu.__init__).

When the axon TPU plugin is present but its relay socket is unreachable,
first backend initialization blocks forever — the preflight must detect
that and pin jax to CPU instead of hanging (bench.py / CLI / driver
compile checks all ride it)."""

import socket

import jax
import pytest

import polar_tpu


def test_preflight_noop_without_plugin(monkeypatch):
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    assert polar_tpu._axon_relay_preflight() is False


def test_preflight_noop_when_relay_up(monkeypatch):
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")

    class _Sock:
        def close(self):
            pass

    monkeypatch.setattr(socket, "create_connection",
                        lambda *a, **kw: _Sock())
    assert polar_tpu._axon_relay_preflight() is False


def test_preflight_pins_cpu_when_relay_down(monkeypatch):
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")

    def _refuse(*a, **kw):
        raise ConnectionRefusedError("down")

    monkeypatch.setattr(socket, "create_connection", _refuse)
    prev = jax.config.jax_platforms
    try:
        assert polar_tpu._axon_relay_preflight() is True
        assert jax.config.jax_platforms == "cpu"
    finally:
        jax.config.update("jax_platforms", prev)


def test_preflight_skip_env(monkeypatch):
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    monkeypatch.setenv("POLAR_TPU_SKIP_RELAY_PREFLIGHT", "1")

    def _boom(*a, **kw):  # the probe must not even run
        raise AssertionError("probe ran despite skip env")

    monkeypatch.setattr(socket, "create_connection", _boom)
    assert polar_tpu._axon_relay_preflight() is False
