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
    from polar_tpu.sim import sim_ber

    n, k = 32, 16
    frozen, _ = generate_5g_ranking(k, n)
    model = SystemAWGNModel(n, k, PolarEncoder(frozen, n),
                            PolarSCDecoder(frozen, n))
    sharded = ShardedSystem(model)
    assert sharded.num_shards == 8
    bit_e, blk_e, nb_bits, nb_blocks = sharded.counted_step(
        jax.random.PRNGKey(7), batch_size=64, ebno_db=2.0)

    import tempfile
    jsonl = os.path.join(tempfile.gettempdir(), "mh_sim_single.jsonl")
    if os.path.exists(jsonl):
        os.remove(jsonl)
    ber, bler = sim_ber(sharded, ebno_dbs=[0.0, 2.0, 6.0, 8.0], batch_size=64,
                        max_mc_iter=8, target_block_errs=20, verbose=False,
                        seed=11, jsonl_path=jsonl)
    with open(jsonl) as f:
        recs = [json.loads(line) for line in f]
    os.remove(jsonl)
    sweep = {
        "sweep_ber": [float(x) for x in ber],
        "sweep_bler": [float(x) for x in bler],
        "sweep_status": [r["status"] for r in recs],
        "sweep_nb_blocks": [r["num_blocks"] for r in recs],
    }
    return int(bit_e), int(blk_e), int(nb_bits), int(nb_blocks), sweep


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

    bit_e, blk_e, nb_bits, nb_blocks, sweep = _single_process_reference()
    assert by_pid[0]["nb_bits"] == nb_bits
    assert by_pid[0]["nb_blocks"] == nb_blocks
    assert by_pid[0]["bit_errors"] == bit_e
    assert by_pid[0]["block_errors"] == blk_e
    assert 0 < bit_e < nb_bits  # 2 dB on n=32: some but not all bits wrong

    # sim_ber sweep: both processes took identical early-stop/target
    # branches (same statuses, same batch counts) and produced the exact
    # single-process results (VERDICT r2 task 6 / SURVEY section 7)
    for field in ("sweep_ber", "sweep_bler", "sweep_status",
                  "sweep_nb_blocks"):
        assert by_pid[0][field] == by_pid[1][field], field
        assert by_pid[0][field] == sweep[field], field
    # the points must exercise real decisions: target stops (status 4 at
    # 0/2 dB) and the error-free early stop at 6 dB, which SKIPS the 8 dB
    # point entirely — only 3 of the 4 points have JSONL records. (The
    # early-stopped point itself records status 1: like the reference, the
    # table/metrics row is emitted before status flips to 2.)
    assert sweep["sweep_status"] == [4, 4, 1], sweep
    assert len(sweep["sweep_nb_blocks"]) == 3, sweep
    assert sweep["sweep_ber"][-1] == 0.0  # 8 dB never simulated
