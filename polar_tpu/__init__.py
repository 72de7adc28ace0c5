"""polar_tpu — a TPU-native (JAX/XLA/Pallas) polar-code FEC simulation framework.

A from-scratch re-design of the capabilities of the reference project
`jaco267/polar-code-pytorch-sionna` (a PyTorch/NumPy re-implementation of
NVIDIA Sionna's polar FEC stack) for TPU hardware:

* all code construction (frozen sets, interleavers, CRC generator matrices,
  decode schedules) happens on host at build time as static NumPy;
* everything inside ``jax.jit`` is fixed-shape, statically scheduled, and
  laid out batch-minor so the VPU lanes ride the Monte-Carlo batch axis;
* the Monte-Carlo harness scales over a ``jax.sharding.Mesh`` (pure data
  parallelism over the batch axis, ``psum``-reduced error counters).

Public surface mirrors the reference's (Sionna-compatible) API:
encoders/decoders are lightweight objects built on host whose ``__call__``
is a pure, jittable function.
"""

import os as _os


def _axon_relay_preflight() -> bool:
    """Fail over to CPU when the axon TPU relay is unreachable.

    In this container the TPU is reached through a local relay
    (127.0.0.1:8083); the axon PJRT plugin registered at interpreter boot
    blocks FOREVER on first backend initialization when that relay is
    down. Probe the socket once at import time and, if unreachable, pin
    jax to CPU (loudly) so CLI runs, benches, and driver compile checks
    degrade to a slow-but-correct CPU run instead of hanging.
    """
    if not _os.environ.get("PALLAS_AXON_POOL_IPS"):
        return False  # no axon plugin in this environment
    if _os.environ.get("POLAR_TPU_SKIP_RELAY_PREFLIGHT") == "1":
        return False
    import socket
    try:
        socket.create_connection(("127.0.0.1", 8083), timeout=5).close()
        return False
    except OSError:
        import sys

        import jax
        jax.config.update("jax_platforms", "cpu")
        print("polar_tpu: axon TPU relay 127.0.0.1:8083 unreachable -- "
              "falling back to the CPU backend", file=sys.stderr)
        return True


#: True when the import-time probe found the TPU relay down and pinned CPU.
TPU_RELAY_FALLBACK = _axon_relay_preflight()

from polar_tpu.ops.ebno import ebnodb2no
from polar_tpu.ops.source import BinarySource, binary_source
from polar_tpu.ops.mapping import Constellation, QamConstell, Mapper, Demapper, SymbolLogits2LLRs
from polar_tpu.ops.channels import AWGN, BinaryErasureChannel, BinarySymmetricChannel, complex_normal
from polar_tpu.ops.crc import CRCEncoder, CRCDecoder
from polar_tpu.models.polar.construction import (
    generate_5g_ranking,
    generate_ga_code,
    generate_rm_code,
    get_kern_frozen_bits,
    gen_arikan,
)
from polar_tpu.models.polar.encode import PolarEncoder, Polar5GEncoder
from polar_tpu.models.polar.sc import PolarSCDecoder
from polar_tpu.models.polar.scl import PolarSCLDecoder
from polar_tpu.models.polar.hybrid import HybridSCLDecoder
from polar_tpu.models.polar.bp import PolarBPDecoder
from polar_tpu.models.polar.decode5g import Polar5GDecoder
from polar_tpu.models.osd import OSDecoder
from polar_tpu.models.no_code import NoEncoder, NoDecoder
from polar_tpu.models.systems import SystemAWGNModel, SystemBECModel
from polar_tpu.sim import sim_ber, count_errors, count_block_errors, hard_decisions
from polar_tpu.plotting import PlotBER

# Reference-compatible aliases (`x_run_sn_polar` / `my_sn` class names).
SC_Dec = PolarSCDecoder
SCL_Dec = PolarSCLDecoder
System_AWGN_model = SystemAWGNModel
System_BEC_model = SystemBECModel
no_encoder = NoEncoder
no_decoder = NoDecoder

__version__ = "0.1.0"

__all__ = [
    "ebnodb2no", "BinarySource", "binary_source",
    "Constellation", "QamConstell", "Mapper", "Demapper", "SymbolLogits2LLRs",
    "AWGN", "BinaryErasureChannel", "BinarySymmetricChannel", "complex_normal",
    "CRCEncoder", "CRCDecoder",
    "generate_5g_ranking", "generate_rm_code", "generate_ga_code", "get_kern_frozen_bits", "gen_arikan",
    "PolarEncoder", "Polar5GEncoder",
    "PolarSCDecoder", "PolarSCLDecoder", "HybridSCLDecoder", "PolarBPDecoder", "Polar5GDecoder",
    "OSDecoder", "NoEncoder", "NoDecoder",
    "SystemAWGNModel", "SystemBECModel",
    "sim_ber", "count_errors", "count_block_errors", "hard_decisions",
    "PlotBER",
    "SC_Dec", "SCL_Dec", "System_AWGN_model", "System_BEC_model",
    "no_encoder", "no_decoder",
]
