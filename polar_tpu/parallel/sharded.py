"""Sharded Monte-Carlo stepping: ``shard_map`` the full link chain over a
1-D mesh, reduce error counters with ``psum`` inside the program."""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from polar_tpu.sim import count_errors, count_block_errors, hard_decisions
from polar_tpu.parallel.mesh import make_mesh


class ShardedSystem:
    """Data-parallel wrapper around a system model with a pure ``step``.

    Exposes ``counted_step(key, batch_size, ebno_db) -> (bit_errors,
    block_errors, nb_bits, nb_blocks)`` where the counters are already
    ``psum``-reduced across the mesh — the contract ``sim_ber`` consumes
    (``polar_tpu/sim.py``). Each shard folds the key with its mesh position,
    so a run is reproducible for a fixed (seed, num_devices) and the host
    only ever sees four scalars per batch.
    """

    def __init__(self, model, mesh: Mesh = None, axis_name: str = "mc",
                 soft_estimates: bool = False):
        assert hasattr(model, "step"), (
            "ShardedSystem needs a model with a pure step(key, batch_size, "
            "ebno_db) method")
        self.model = model
        self.mesh = mesh if mesh is not None else make_mesh()
        self.axis_name = axis_name
        self.soft_estimates = soft_estimates
        self.num_shards = self.mesh.devices.size
        self._jit_steps = {}

    def _build(self, batch_size: int):
        assert batch_size % self.num_shards == 0, (
            f"batch_size {batch_size} must divide evenly over "
            f"{self.num_shards} devices")
        local_bs = batch_size // self.num_shards
        ax = self.axis_name

        def shard_fn(key, ebno_db):
            # independent per-shard stream: fold in the mesh position
            key = jax.random.fold_in(key[0], jax.lax.axis_index(ax))
            b, b_hat = self.model.step(key, local_bs, ebno_db[0])
            if self.soft_estimates:
                b_hat = hard_decisions(b_hat)
            bit_e = jax.lax.psum(count_errors(b, b_hat), ax)
            blk_e = jax.lax.psum(count_block_errors(b, b_hat), ax)
            return bit_e, blk_e

        smapped = jax.shard_map(
            shard_fn, mesh=self.mesh,
            in_specs=(P(ax), P(ax)),
            out_specs=(P(), P()),
        )

        def counted(key, ebno_db):
            # replicate inputs by tiling over the mesh axis (tiny scalars)
            keys = jnp.broadcast_to(key[None], (self.num_shards,) + key.shape)
            ebnos = jnp.broadcast_to(jnp.float32(ebno_db)[None],
                                     (self.num_shards,))
            bit_e, blk_e = smapped(keys, ebnos)
            return bit_e, blk_e

        jitted = jax.jit(counted)

        # bit/block totals are static
        b_shape = jax.eval_shape(
            lambda k: self.model.step(k, local_bs, jnp.float32(0.0))[0],
            jax.random.PRNGKey(0))
        nb_bits = int(jnp.prod(jnp.asarray(b_shape.shape))) * self.num_shards
        nb_blocks = (nb_bits // b_shape.shape[-1])

        def full(key, ebno_db):
            bit_e, blk_e = jitted(key, ebno_db)
            return bit_e, blk_e, nb_bits, nb_blocks

        return full

    def counted_step(self, key, batch_size: int, ebno_db):
        if batch_size not in self._jit_steps:
            self._jit_steps[batch_size] = self._build(batch_size)
        return self._jit_steps[batch_size](key, ebno_db)
