"""Monte-Carlo BER/BLER simulation harness.

Behavioral parity with reference ``my_sn/sim.py:19-140``: per-SNR-point loop
of up to ``max_mc_iter`` batches, int64 error counters, the same five status
codes and the same live progress table, early stop on the first error-free
SNR point. TPU-native extensions:

* explicit PRNG keys folded per (snr point, iteration) — bit-reproducible
  regardless of execution order or sharding;
* when the model exposes a pure ``step``, the error counting is fused into
  the jitted chain so only two scalars cross the host boundary per batch;
* optional JSONL metrics emission and counter checkpoint/resume
  (``state_path``) for long sweeps — the reference keeps all state in RAM.
"""

import json
import os
import time
import warnings

import numpy as np
import jax
import jax.numpy as jnp

STATUS_LEVELS = [
    "not simulated",
    "reached max iter       ",
    "no errors - early stop",
    "reached target bit errors",
    "reached target block errors",
]


def hard_decisions(llr):
    """Logits to bits: ``llr > 0 -> 1``."""
    return jnp.where(llr > 0, 1.0, 0.0)


def count_errors(b, b_hat):
    """Total number of differing bits (int32 on device; the harness
    accumulates in host int64, so per-batch counts stay well in range)."""
    return jnp.sum(jnp.not_equal(b, b_hat).astype(jnp.int32))


def count_block_errors(b, b_hat):
    """Number of blocks (last dim) with at least one bit error."""
    errors = jnp.not_equal(b, b_hat)
    return jnp.sum(jnp.any(errors, axis=-1).astype(jnp.int32))


def _print_progress(is_final, rt, ebno_db, idx_it, max_mc_iter, bit_errors,
                    nb_bits, block_errors, nb_blocks, status,
                    header_text=None):
    end_str = "\n" if is_final else "\r"
    if header_text is not None:
        row_text = header_text
        end_str = "\n"
    else:
        ber_np = np.nan_to_num(bit_errors / max(nb_bits, 1e-12))
        bler_np = np.nan_to_num(block_errors / max(nb_blocks, 1e-12))
        if status == 0:
            status_txt = f"iter: {idx_it:.0f}/{max_mc_iter:.0f}"
        else:
            status_txt = STATUS_LEVELS[int(status)]
        row_text = [str(np.round(ebno_db, 3)), f"{ber_np:.4e}",
                    f"{bler_np:.4e}", np.round(bit_errors, 0),
                    np.round(nb_bits, 0), np.round(block_errors, 0),
                    np.round(nb_blocks, 0), np.round(rt, 1), status_txt]
    print("{: >9} |{: >11} |{: >11} |{: >12} |{: >12} |{: >13} |{: >12} |"
          "{: >12} |{: >10}".format(*row_text), end=end_str)


def _make_counted_step(mc_fun, batch_size, soft_estimates):
    """Fuse chain + error counting into one jitted program when possible."""
    if hasattr(mc_fun, "counted_step"):
        # already-reduced counters (e.g. parallel.ShardedSystem over a mesh)
        def distributed(key, ebno_db):
            return mc_fun.counted_step(key, batch_size, ebno_db)
        return distributed

    if hasattr(mc_fun, "step") and not getattr(mc_fun, "requires_host",
                                               False):
        def counted(key, ebno_db):
            b, b_hat = mc_fun.step(key, batch_size, ebno_db)
            if soft_estimates:
                b_hat = hard_decisions(b_hat)
            return count_errors(b, b_hat), count_block_errors(b, b_hat), \
                b.size, b.size // b.shape[-1]
        return jax.jit(counted)

    # host-orchestrated chains (e.g. hybrid SC/SCL) and plain callables:
    # the chain runs outside jit, but the counters stay jitted (eager
    # reductions are unreliable on the axon TPU backend)
    @jax.jit
    def _count(b, b_hat):
        if soft_estimates:
            b_hat = hard_decisions(b_hat)
        return count_errors(b, b_hat), count_block_errors(b, b_hat)

    def fallback(key, ebno_db):
        b, b_hat = mc_fun(key, batch_size, ebno_db)
        errs, blk = _count(b, b_hat)
        return (errs, blk, b.size, b.size // b.shape[-1])
    return fallback


def sim_ber(mc_fun, ebno_dbs, batch_size, max_mc_iter, soft_estimates=False,
            target_bit_errs=None, target_block_errs=None, early_stop=True,
            verbose=True, seed=42, key=None, jsonl_path=None,
            state_path=None, distributed=None):
    """Monte-Carlo BER/BLER sweep. Returns ``(ber, bler)`` as np.float64.

    ``mc_fun``: either an object with a pure ``step(key, batch_size,
    ebno_db) -> (b, b_hat)`` method (preferred — the counting fuses into the
    jitted chain) or a callable ``mc_fun(key, batch_size, ebno_db)``.

    ``distributed`` is deprecated and ignored — wrap the chain in
    ``parallel.sharded.ShardedSystem`` instead (collectives live inside
    ``mc_fun``, not the sweep loop).
    """
    if distributed is not None:
        warnings.warn("sim_ber(distributed=...) is deprecated and ignored; "
                      "use parallel.sharded.ShardedSystem.",
                      DeprecationWarning, stacklevel=2)
    ebno_dbs = np.asarray(ebno_dbs, dtype=np.float32)
    num_points = ebno_dbs.shape[0]
    bit_errors = np.zeros(num_points, dtype=np.int64)
    block_errors = np.zeros(num_points, dtype=np.int64)
    nb_bits = np.zeros(num_points, dtype=np.int64)
    nb_blocks = np.zeros(num_points, dtype=np.int64)
    status = np.zeros(num_points, dtype=np.int64)
    runtime = np.zeros(num_points, dtype=np.float64)
    start_point = 0

    # resume from checkpoint if present
    if state_path is not None and os.path.exists(state_path):
        with np.load(state_path) as st:
            if (st["ebno_dbs"].shape == ebno_dbs.shape
                    and np.allclose(st["ebno_dbs"], ebno_dbs)):
                bit_errors = st["bit_errors"]
                block_errors = st["block_errors"]
                nb_bits = st["nb_bits"]
                nb_blocks = st["nb_blocks"]
                status = st["status"]
                runtime = st["runtime"]
                start_point = int(st["next_point"])

    if key is None:
        key = jax.random.PRNGKey(seed)
    counted_step = _make_counted_step(mc_fun, batch_size, soft_estimates)

    header_text = ["EbNo [dB]", "BER", "BLER", "bit errors", "num bits",
                   "block errors", "num blocks", "runtime [s]", "status"]

    def save_state(next_point):
        if state_path is not None:
            np.savez(state_path, ebno_dbs=ebno_dbs, bit_errors=bit_errors,
                     block_errors=block_errors, nb_bits=nb_bits,
                     nb_blocks=nb_blocks, status=status, runtime=runtime,
                     next_point=next_point)

    jsonl_f = open(jsonl_path, "a") if jsonl_path is not None else None
    try:
        for i in range(start_point, num_points):
            t0 = time.perf_counter()
            iter_count = -1
            status[i] = 0
            for ii in range(max_mc_iter):
                iter_count += 1
                it_key = jax.random.fold_in(jax.random.fold_in(key, i), ii)
                bit_e, block_e, bit_n, block_n = counted_step(
                    it_key, jnp.float32(ebno_dbs[i]))
                bit_errors[i] += int(bit_e)
                block_errors[i] += int(block_e)
                nb_bits[i] += int(bit_n)
                nb_blocks[i] += int(block_n)
                if verbose:
                    if i == start_point and iter_count == 0:
                        _print_progress(True, 0, 0, 0, max_mc_iter, 0, 0, 0,
                                        0, 0, header_text=header_text)
                        print("-" * 135)
                    rt = time.perf_counter() - t0
                    _print_progress(False, rt, ebno_dbs[i], ii, max_mc_iter,
                                    bit_errors[i], nb_bits[i],
                                    block_errors[i], nb_blocks[i], status[i])
                if (target_bit_errs is not None
                        and bit_errors[i] >= target_bit_errs):
                    status[i] = 3
                    runtime[i] = time.perf_counter() - t0
                    break
                if (target_block_errs is not None
                        and block_errors[i] >= target_block_errs):
                    status[i] = 4
                    runtime[i] = time.perf_counter() - t0
                    break
                if iter_count == max_mc_iter - 1:
                    status[i] = 1
                    runtime[i] = time.perf_counter() - t0
            if verbose:
                _print_progress(True, runtime[i], ebno_dbs[i], iter_count,
                                max_mc_iter, bit_errors[i], nb_bits[i],
                                block_errors[i], nb_blocks[i], status[i])
            if jsonl_f is not None:
                jsonl_f.write(json.dumps({
                    "ebno_db": float(ebno_dbs[i]),
                    "bit_errors": int(bit_errors[i]),
                    "num_bits": int(nb_bits[i]),
                    "block_errors": int(block_errors[i]),
                    "num_blocks": int(nb_blocks[i]),
                    "runtime_s": float(runtime[i]),
                    "status": int(status[i]),
                }) + "\n")
                jsonl_f.flush()
            if early_stop and block_errors[i] == 0:
                status[i] = 2
                if verbose:
                    print(f"\nSimulation stopped as no error occurred "
                          f"@ EbNo = {ebno_dbs[i]:.1f} dB.\n")
                save_state(i + 1)
                break
            save_state(i + 1)
    finally:
        if jsonl_f is not None:
            jsonl_f.close()

    with np.errstate(divide="ignore", invalid="ignore"):
        ber = np.nan_to_num(bit_errors / nb_bits)
        bler = np.nan_to_num(block_errors / nb_blocks)
    return ber, bler
