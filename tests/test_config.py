"""CLI config parsing (polar_tpu/config.py — the argparse bridge that
mirrors the reference's pyrallis ``PolarConfig``,
``/root/reference/x_run_sn_polar/config.py:5-26``)."""

from polar_tpu.config import PolarConfig, parse_config


def test_defaults_match_reference_fields():
    c = parse_config([])
    assert (c.k, c.n, c.bs, c.list_size) == (32, 64, 3, 8)
    assert c.algos == ["scl"]
    assert c.mode == "max"


def test_algos_reference_list_syntax():
    assert parse_config(["--algos", "[scl]"]).algos == ["scl"]
    assert parse_config(["--algos", "[scl,bp]"]).algos == ["scl", "bp"]
    assert parse_config(["--algos", "scl"]).algos == ["scl"]


def test_bool_parsing():
    assert parse_config(["--verbose", "true"]).verbose is True
    assert parse_config(["--verbose", "0"]).verbose is False


def test_fast_scl_tristate():
    # unset -> None (engine default); explicit true/false must survive —
    # an explicit False used to be conflated with unset, making the plain
    # schedule unreachable from the CLI on the unrolled engine
    assert parse_config([]).fast_scl is None
    assert parse_config(["--fast_scl", "true"]).fast_scl is True
    assert parse_config(["--fast_scl", "false"]).fast_scl is False


def test_numeric_fields():
    c = parse_config(["--k", "128", "--n", "256", "--snr_end", "3.5"])
    assert (c.k, c.n, c.snr_end) == (128, 256, 3.5)
    assert isinstance(c, PolarConfig)
