"""One-shot fused-kernel compile/run probe (TPU diagnosis tool).

Compiles (and optionally runs) a single Pallas kernel config in a fresh
process — one config per invocation because only one process may own the
axon TPU and a crashed remote compile needs a cooldown before the next.
Used to bisect Mosaic compile crashes such as the throughput-suite
``sc_n64``/``sc_n256`` HTTP-500 (``tpu_compile_helper subprocess exit
code 1``) by sweeping (kernel body) x (batch tile) independently:

    python benchmarks/probe_kernel.py --kind sc --b 6 --tile 4096 --fast 1
    python benchmarks/probe_kernel.py --kind scl --b 9 --tile 256 \
        --vmem_mib 32 --run 1

Prints one JSON line {ok, kind, b, tile, ...} and exits 0 even on
failure (the error rides the JSON) so sweep loops never die.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", choices=["sc", "scl"], default="sc")
    ap.add_argument("--b", type=int, default=6)
    ap.add_argument("--L", type=int, default=8)
    ap.add_argument("--bs", type=int, default=8192)
    ap.add_argument("--tile", type=int, default=0,
                    help="batch tile (0 = fit_tile auto)")
    ap.add_argument("--fast", type=int, default=1,
                    help="1 = rate-0-pruned static schedule (the new body),"
                         " 0 = static frozen-set body (unpruned)")
    ap.add_argument("--traced", type=int, default=0,
                    help="1 = generic traced frz-in-SMEM body (the cold-"
                         "cache bench ladder leader); overrides --fast")
    ap.add_argument("--vmem_mib", type=int, default=0,
                    help="raise the Mosaic scoped-VMEM limit (MiB)")
    ap.add_argument("--run", type=int, default=0,
                    help="1 = also execute and time the kernel")
    ap.add_argument("--cold", type=int, default=1,
                    help="1 = disable the persistent XLA compile cache")
    args = ap.parse_args()

    if args.vmem_mib:
        os.environ["POLAR_TPU_VMEM_LIMIT_MIB"] = str(args.vmem_mib)
    if args.cold:
        os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

    out = {"ok": False, "kind": args.kind, "b": args.b, "tile": args.tile,
           "bs": args.bs, "fast": args.fast, "traced": args.traced,
           "vmem_mib": args.vmem_mib}
    try:
        import numpy as np
        import jax
        import jax.numpy as jnp
        import polar_tpu as pt
        from polar_tpu.models.polar import pallas_scl as pk
        from polar_tpu.models.polar.scan_core import fast_schedule

        interp = jax.default_backend() == "cpu"  # CPU smoke runs interpret
        n = 1 << args.b
        k = n // 2
        frozen, _ = pt.generate_5g_ranking(k, n)
        mask = np.zeros(n, dtype=bool)
        mask[frozen] = True
        tile = args.tile or None
        t0 = time.perf_counter()
        if args.kind == "sc":
            sched = (tuple(fast_schedule(mask, rep=False))
                     if args.fast and not args.traced else None)
            frz = (None if sched is not None
                   else jnp.asarray(mask.astype(np.int32)))
            fn = lambda a: pk.sc_subtree_pallas(
                a, frz, b=args.b, llr_max=30.0, mode="minsum",
                tile=tile, sched_static=sched, interpret=interp)
            a_s = jax.ShapeDtypeStruct((n, args.bs), jnp.float32)
            compiled = jax.jit(fn).lower(a_s).compile()
            out["compile_s"] = round(time.perf_counter() - t0, 1)
            if args.run:
                a = jax.jit(lambda key: jax.random.normal(
                    key, (n, args.bs)))(jax.random.PRNGKey(0))
                float(jnp.sum(compiled(a)))  # warm + sync
                t1 = time.perf_counter()
                for i in range(8):
                    r = compiled(a)
                out["sum"] = float(jnp.sum(r))
                out["run_ms"] = round(
                    (time.perf_counter() - t1) / 8 * 1e3, 3)
        else:
            if args.traced:
                sched, frz_static = None, None
                frz_arr = jnp.asarray(mask.astype(np.int32))
            else:
                sched = (tuple(fast_schedule(mask, rep=True))
                         if args.fast else None)
                frz_static = (None if args.fast
                              else tuple(int(x) for x in mask))
                frz_arr = None
            fn = lambda a, pm: pk.subtree_pallas(
                a, frz_arr, pm, b=args.b, L=args.L, llr_max=30.0,
                mode="minsum", tile=tile, frz_static=frz_static,
                sched_static=sched, interpret=interp)
            a_s = jax.ShapeDtypeStruct((n, args.L, args.bs), jnp.float32)
            pm_s = jax.ShapeDtypeStruct((args.L, args.bs), jnp.float32)
            compiled = jax.jit(fn).lower(a_s, pm_s).compile()
            out["compile_s"] = round(time.perf_counter() - t0, 1)
            if args.run:
                a, pm = jax.jit(lambda key: (
                    jax.random.normal(key, (n, args.L, args.bs)),
                    jnp.zeros((args.L, args.bs), jnp.float32),
                ))(jax.random.PRNGKey(0))
                cw, P, pmo = compiled(a, pm)
                float(jnp.sum(pmo))  # warm + sync
                t1 = time.perf_counter()
                for i in range(8):
                    cw, P, pmo = compiled(a, pm)
                out["sum"] = float(jnp.sum(pmo))
                out["run_ms"] = round(
                    (time.perf_counter() - t1) / 8 * 1e3, 3)
        out["ok"] = True
    except Exception as e:
        out["error"] = f"{type(e).__name__}: {str(e)[:500]}"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
