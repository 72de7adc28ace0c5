"""Data-parallel Monte-Carlo over a device mesh (multi-chip / multi-host).

The MC batch axis is sharded over a 1-D `jax.sharding.Mesh`; error
counters are `psum`-reduced on device. Results are bit-identical to the
single-device run with the same seed (tests/test_parallel.py).

Run on CPU with virtual devices to try it anywhere:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/03_multichip.py

Multi-host (one process per host; see polar_tpu/parallel/multihost.py):

    from polar_tpu.parallel import initialize
    initialize(coordinator_address="host0:1234", num_processes=2,
               process_id=<rank>)
"""

import os
import sys

# runnable without installation: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import polar_tpu as pt
from polar_tpu.parallel import ShardedSystem, make_mesh


def main():
    print(f"devices: {jax.devices()}")
    k, n = 128, 256
    frozen, _ = pt.generate_5g_ranking(k, n)
    model = pt.SystemAWGNModel(n, k, pt.PolarEncoder(frozen, n),
                               pt.PolarSCLDecoder(frozen, n, list_size=8))

    sharded = ShardedSystem(model, make_mesh())  # all local devices
    ber, bler = pt.sim_ber(sharded, [1.0, 2.0, 3.0], batch_size=4096,
                           max_mc_iter=20, target_block_errs=200)
    print("BER :", ber)
    print("BLER:", bler)


if __name__ == "__main__":
    main()
