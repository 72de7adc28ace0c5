"""Dataclass-based CLI configuration (parity with the reference's pyrallis
``PolarConfig``, ``x_run_sn_polar/config.py:5-26``, plus mesh/shard flags
for the TPU build). No external dependency: a small argparse bridge exposes
every dataclass field as ``--flag`` and understands the reference's
``--algos [scl]`` list syntax."""

import argparse
import dataclasses
from dataclasses import dataclass, field
from typing import List


@dataclass
class PolarConfig:
    # code parameters
    k: int = 32            # number of information bits per codeword
    n: int = 64            # desired codeword length
    algos: List[str] = field(default_factory=lambda: ["scl"])
    kern: str = "F2"       # kernel name (test-only in the reference)
    verbose: bool = False
    bs: int = 3            # Monte-Carlo batch size
    snr_end: float = 5.0   # sweep = arange(0, snr_end, 0.5)
    mc_iter: int = 10      # max Monte-Carlo iterations per SNR point
    list_size: int = 8     # SCL list size
    mode: str = "max"      # f-function: "max"/"minsum" or "llr"/"exact"
    spec: bool = False     # apply special cases (test-only in the reference)
    # --- TPU-native extensions ---
    seed: int = 42
    construction: str = "rm"   # "rm" (reference CLI, stable ties),
    # "rm-ref" (reference's EXACT unstable-argsort sets), "5g" table,
    # or "ga" (DE/GA)
    num_devices: int = 0       # 0 = all local devices (data-parallel MC)
    target_block_errs: int = 1000
    bp_iter: int = 20          # BP decoder iterations (algos=[...,bp])
    osd_t: int = 2             # OSD order for non-F2 kernel codes (--kern)
    # Hashemi rate-0/rep pruned SCL schedule (the my_sn reference default;
    # the CLI-reference x_run SCL is plain). Tri-state: None = the engine
    # default (fast on the unrolled engine, plain otherwise); an explicit
    # --fast_scl true/false overrides the engine either way.
    fast_scl: bool | None = None
    design_snr: float = 2.0    # design Eb/N0 (dB) for --construction ga
    plot_dir: str = "plots"


def _parse_value(ftype, raw):
    if (ftype == bool or ftype == "bool"
            or str(ftype) in ("bool | None", "typing.Optional[bool]")):
        return raw in ("1", "true", "True", "yes")
    if ftype in (List[str], "List[str]"):
        raw = raw.strip()
        if raw.startswith("[") and raw.endswith("]"):
            raw = raw[1:-1]
        return [s.strip() for s in raw.split(",") if s.strip()]
    return ftype(raw)


def parse_config(argv=None, cls=PolarConfig):
    """Parse CLI flags into a config dataclass."""
    parser = argparse.ArgumentParser(description=cls.__doc__)
    for f in dataclasses.fields(cls):
        parser.add_argument(f"--{f.name}", type=str, default=None)
    args = parser.parse_args(argv)
    kwargs = {}
    for f in dataclasses.fields(cls):
        raw = getattr(args, f.name)
        if raw is not None:
            kwargs[f.name] = _parse_value(f.type, raw)
    return cls(**kwargs)
