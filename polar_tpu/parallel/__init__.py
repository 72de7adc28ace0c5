"""Multi-chip / multi-host data parallelism for the Monte-Carlo harness.

The reference has **no** distributed code at all (SURVEY.md section 5 —
no ``torch.distributed``, no multiprocessing; grep-verified); scaling is a
TPU-native addition. The Monte-Carlo batch is embarrassingly parallel, so the
design is pure DP over a 1-D ``jax.sharding.Mesh``:

* each device runs an independent shard of the batch with a PRNG key folded
  by its mesh position (bit-reproducible regardless of device count),
* error counters are ``psum``-reduced over ICI inside the jitted program, so
  only four scalars ever reach the host per batch,
* early-stop decisions are taken on the replicated reduced counters, so all
  hosts agree on control flow by construction.
"""

from polar_tpu.parallel.mesh import make_mesh
from polar_tpu.parallel.sharded import ShardedSystem
from polar_tpu.parallel.multihost import initialize, is_main_process

__all__ = ["make_mesh", "ShardedSystem", "initialize", "is_main_process"]
