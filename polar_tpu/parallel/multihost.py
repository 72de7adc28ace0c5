"""Multi-host (multi-process) simulation setup.

The reference is strictly single-process (SURVEY.md section 5); this is the
TPU-native scale-out path. Monte-Carlo FEC simulation is pure data
parallelism, so multi-host needs only:

* `jax.distributed.initialize` (one process per host, all chips visible
  through the global mesh),
* a mesh over **all** devices (`make_mesh()` already returns the global
  device list once initialize() has run),
* `psum`-reduced counters (ShardedSystem does this inside jit, so every
  host sees identical reduced counters and takes identical early-stop
  branches — the requirement called out in SURVEY.md section 7).

Counter checkpointing for long sweeps lives in ``sim.sim_ber``
(``state_path=...``); on restart, counters resume regardless of the new
process layout because all persistent state is a handful of host int64s.
"""

import jax


def initialize(coordinator_address: str = None, num_processes: int = None,
               process_id: int = None, local_device_ids=None):
    """Initialize multi-process JAX (thin wrapper over jax.distributed).

    On TPU pods with standard orchestration (GKE/xmanager), call with no
    arguments — the runtime autodetects everything. Returns
    (process_index, process_count, global_device_count).
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
    return jax.process_index(), jax.process_count(), len(jax.devices())


def is_main_process() -> bool:
    """True on the process that should own logging/plot/checkpoint IO."""
    return jax.process_index() == 0
