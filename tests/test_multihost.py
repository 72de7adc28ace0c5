"""Multi-host execution proof (SURVEY section 7 step 10).

Spawns TWO coordinated JAX processes on localhost (CPU backend, 4 virtual
devices each -> 8 global) through ``parallel.multihost.initialize`` and
drives ``ShardedSystem`` over the global mesh. The psum-reduced counters
must (a) agree across the two processes and (b) exactly equal a
single-process 8-device run of the same seed — ShardedSystem folds each
shard's PRNG key with its GLOBAL mesh position, so the process layout must
not change the statistics.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_reference():
    """Same chain on this process's 8-device virtual mesh (conftest)."""
    from polar_tpu.models.polar.construction import generate_5g_ranking
    from polar_tpu.models.polar.encode import PolarEncoder
    from polar_tpu.models.polar.sc import PolarSCDecoder
    from polar_tpu.models.systems import SystemAWGNModel
    from polar_tpu.parallel.sharded import ShardedSystem

    n, k = 32, 16
    frozen, _ = generate_5g_ranking(k, n)
    model = SystemAWGNModel(n, k, PolarEncoder(frozen, n),
                            PolarSCDecoder(frozen, n))
    sharded = ShardedSystem(model)
    assert sharded.num_shards == 8
    bit_e, blk_e, nb_bits, nb_blocks = sharded.counted_step(
        jax.random.PRNGKey(7), batch_size=64, ebno_db=2.0)
    return int(bit_e), int(blk_e), int(nb_bits), int(nb_blocks)


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs the 8-virtual-device conftest mesh")
def test_two_process_counters_match_single_process():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device split
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            env=env, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    by_pid = {o["process"]: o for o in outs}
    assert set(by_pid) == {0, 1}
    assert by_pid[0]["is_main"] and not by_pid[1]["is_main"]
    # every process sees the same globally-reduced counters
    for field in ("bit_errors", "block_errors", "nb_bits", "nb_blocks"):
        assert by_pid[0][field] == by_pid[1][field], field

    bit_e, blk_e, nb_bits, nb_blocks = _single_process_reference()
    assert by_pid[0]["nb_bits"] == nb_bits
    assert by_pid[0]["nb_blocks"] == nb_blocks
    assert by_pid[0]["bit_errors"] == bit_e
    assert by_pid[0]["block_errors"] == blk_e
    assert 0 < bit_e < nb_bits  # 2 dB on n=32: some but not all bits wrong
