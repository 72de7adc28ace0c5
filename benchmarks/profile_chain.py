"""Per-phase time breakdown of the headline chain (VERDICT r3 task 9).

Times each phase of the north-star config (SCL-8, k=512, n=1024, bs=8192,
2 dB) as its own jitted program on the current device:

* ``front``   — source -> encode -> QPSK map -> AWGN -> exact demap
* ``decode``  — the full SCL decode (upper-stage XLA glue + fused subtree
                kernels + CRC/argmin tail)
* ``kernel``  — the fused subtree kernels alone, called standalone on
                fixed inputs (x m subtrees per decode)
* ``chain``   — the fused end-to-end step (what bench.py times); the gap
                chain - front - decode is dispatch/fusion slack

Each timing pipelines ``iters`` dispatches and syncs once (relay-safe),
after burning the ramp. Writes benchmarks/phase_breakdown.json and prints
a table for docs/PERFORMANCE.md.

    python benchmarks/profile_chain.py [--iters 24] [--bs 8192] [--fast 1]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/polar_tpu_xla"))

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, args_fn, iters, burn=12, reps=2):
    """Pipelined wall-clock of ``fn`` over ``iters`` dispatches (one sync);
    ``args_fn(i)`` supplies per-iteration args. Returns min seconds/iter
    over ``reps`` measured windows — the relay's dispatch ramp (~50 ms/
    batch on the FIRST loops of every new program) poisons single windows,
    so burn generously and keep the best window."""
    def window():
        t0 = time.perf_counter()
        outs = [fn(*args_fn(i)) for i in range(iters)]
        acc = sum(jnp.sum(jax.tree_util.tree_leaves(o)[0]
                          .astype(jnp.float32)) for o in outs)
        float(acc)
        return (time.perf_counter() - t0) / iters

    outs = [fn(*args_fn(i)) for i in range(burn)]  # compile + ramp burn
    float(jnp.sum(jax.tree_util.tree_leaves(outs[-1])[0]
                  .astype(jnp.float32)))
    return min(window() for _ in range(reps))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--bs", type=int, default=8192)
    ap.add_argument("--fast", type=int, default=1)
    ap.add_argument("--trace_dir", default="",
                    help="also capture a jax.profiler trace of the chain")
    ap.add_argument("--out", default="benchmarks/phase_breakdown.json")
    args = ap.parse_args()

    import polar_tpu as pt
    from polar_tpu.sim import count_errors
    from polar_tpu.models.polar import scan_core
    from polar_tpu.models.polar.pallas_scl import subtree_pallas, fit_tile, \
        scl_vmem_bytes

    k, n, L, bs = 512, 1024, 8, args.bs
    frozen, _ = pt.generate_5g_ranking(k, n)
    enc = pt.PolarEncoder(frozen, n)
    dec = pt.PolarSCLDecoder(frozen, n, list_size=L,
                             use_fast_scl=bool(args.fast))
    model = pt.SystemAWGNModel(n, k, enc, dec)
    e = jnp.float32(2.0)
    keys = [jax.random.PRNGKey(i) for i in range(64)]

    front = jax.jit(lambda key: model.front(key, bs, e))
    decode = jax.jit(dec.decode)

    @jax.jit
    def chain(key):
        b, b_hat = model.step(key, bs, e)
        return count_errors(b, b_hat)

    # fixed LLR input for the decode/kernel phases
    _, _, llr0 = jax.jit(lambda key: model.front(key, bs, e))(keys[0])
    llr0 = jax.block_until_ready(llr0)

    rows = {}
    rows["chain"] = timed(chain, lambda i: (keys[i % 64],), args.iters)
    rows["front"] = timed(front, lambda i: (keys[i % 64],), args.iters)
    rows["decode"] = timed(decode, lambda i: (llr0,), args.iters)

    # standalone fused subtree kernels at the decode's own auto config
    S = int(np.log2(n))
    use_pallas = jax.default_backend() not in ("cpu",) and bs % 128 == 0
    # the fast sweep resolves depth through its own helper (it may pick
    # b = S, the whole tree) — keep the reported b/m faithful to what the
    # decode above actually ran (ADVICE r4)
    b = (scan_core.resolve_fast_lower_stages(S, bs, use_pallas, L)
         if args.fast
         else scan_core.resolve_lower_stages(S, bs, use_pallas, L=L))
    m = n >> b
    mask = np.zeros(n, dtype=bool)
    mask[frozen] = True
    rng = np.random.default_rng(0)
    a0 = jnp.asarray(rng.normal(0, 3, size=(1 << b, L, bs))
                     .astype(np.float32))
    pm0 = jnp.asarray(np.zeros((L, bs), np.float32))
    interp = jax.default_backend() == "cpu"
    kern_secs = 0.0
    if args.fast:
        units, _ = scan_core.split_fast_schedule(mask, b)
        scheds = [u[2] for u in units if u[0] == "sub"]
        for sch in scheds:
            fn = jax.jit(lambda a, pm, sch=tuple(sch): subtree_pallas(
                a, None, pm, b=b, L=L, llr_max=30.0, mode="minsum",
                interpret=interp, sched_static=sch))
            kern_secs += timed(fn, lambda i: (a0, pm0), args.iters)
    else:
        frz_blocks = mask.reshape(m, 1 << b)
        for j in range(m):
            fz = tuple(int(x) for x in frz_blocks[j])
            fn = jax.jit(lambda a, pm, fz=fz: subtree_pallas(
                a, None, pm, b=b, L=L, llr_max=30.0, mode="minsum",
                interpret=interp, frz_static=fz))
            kern_secs += timed(fn, lambda i: (a0, pm0), args.iters)
    rows["kernels"] = kern_secs
    rows["upper_glue"] = rows["decode"] - kern_secs
    rows["slack"] = rows["chain"] - rows["front"] - rows["decode"]

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            for i in range(8):
                chain(keys[i])
            float(chain(keys[8]))

    bits = k * bs
    out = {
        "config": {"k": k, "n": n, "L": L, "bs": bs,
                   "fast": bool(args.fast), "b": b, "m": m,
                   "rate1": os.environ.get("POLAR_TPU_FAST_RATE1",
                                           "0") == "1",
                   "device": str(jax.devices()[0])},
        "secs_per_batch": {kk: round(v, 6) for kk, v in rows.items()},
        "info_bits_per_s": round(bits / rows["chain"], 1),
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["secs_per_batch"]))
    print(f"chain throughput: {out['info_bits_per_s']:.3e} bit/s")
    w = rows["chain"]
    for kk, v in rows.items():
        print(f"{kk:12s} {v * 1e3:8.2f} ms/batch  {100 * v / w:5.1f}%")


if __name__ == "__main__":
    main()
