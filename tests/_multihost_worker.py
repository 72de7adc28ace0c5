"""Worker process for the multi-host test (tests/test_multihost.py).

Runs as one of N coordinated JAX processes on localhost (CPU backend, 4
virtual devices per process), drives ShardedSystem over the GLOBAL mesh,
and prints the psum-reduced counters as one JSON line.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    port = sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    jax.config.update("jax_platforms", "cpu")

    from polar_tpu.parallel import multihost

    pi, pc, n_devices = multihost.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes, process_id=process_id)
    assert pi == process_id and pc == num_processes
    assert n_devices == 4 * num_processes, n_devices

    from polar_tpu.models.polar.construction import generate_5g_ranking
    from polar_tpu.models.polar.encode import PolarEncoder
    from polar_tpu.models.polar.sc import PolarSCDecoder
    from polar_tpu.models.systems import SystemAWGNModel
    from polar_tpu.parallel.sharded import ShardedSystem

    n, k = 32, 16
    frozen, _ = generate_5g_ranking(k, n)
    model = SystemAWGNModel(n, k, PolarEncoder(frozen, n),
                            PolarSCDecoder(frozen, n))
    sharded = ShardedSystem(model)  # global mesh: all 4*num_processes devices
    assert sharded.num_shards == n_devices

    bit_e, blk_e, nb_bits, nb_blocks = sharded.counted_step(
        jax.random.PRNGKey(7), batch_size=64, ebno_db=2.0)

    # full sim_ber sweep under multi-process SPMD (SURVEY section 7: every
    # host must take the SAME branch at every early-stop/target decision —
    # the counters they branch on are psum-reduced and identical). The
    # 3 points exercise target_block_errs (0/2 dB) AND the error-free
    # early stop (6 dB); statuses are recovered from the JSONL metrics.
    import tempfile
    from polar_tpu.sim import sim_ber
    jsonl = os.path.join(tempfile.gettempdir(),
                         f"mh_sim_{process_id}_{port}.jsonl")
    if os.path.exists(jsonl):
        os.remove(jsonl)
    ber, bler = sim_ber(sharded, ebno_dbs=[0.0, 2.0, 6.0, 8.0], batch_size=64,
                        max_mc_iter=8, target_block_errs=20, verbose=False,
                        seed=11, jsonl_path=jsonl)
    with open(jsonl) as f:
        recs = [json.loads(line) for line in f]
    os.remove(jsonl)

    print(json.dumps({
        "process": pi,
        "is_main": multihost.is_main_process(),
        "bit_errors": int(bit_e), "block_errors": int(blk_e),
        "nb_bits": int(nb_bits), "nb_blocks": int(nb_blocks),
        "sweep_ber": [float(x) for x in ber],
        "sweep_bler": [float(x) for x in bler],
        "sweep_status": [r["status"] for r in recs],
        "sweep_nb_blocks": [r["num_blocks"] for r in recs],
    }), flush=True)


if __name__ == "__main__":
    main()
