"""Round-4 TPU measurement session (one long-lived process).

Backend init on the axon relay costs minutes per process, so this probe
batches every round-4 design measurement into ONE process and prints one
JSON line per step (stdout), diagnostics to stderr:

* ``init``       — backend init wall-clock
* ``parcompile`` — do two Mosaic compiles overlap when issued from two
                   Python threads? (gates the bench parallel-warm design)
* ``cold:*``     — cold-compile wall-clock of the named kernel configs
                   (compile cache disabled; AOT .lower().compile(), no
                   input materialization)
* ``run:*``      — execution throughput of a compiled config

Usage: python benchmarks/probe_r4.py step1 step2 ...  (default: init)
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = sys.argv[1:] or ["init"]


def emit(**kw):
    print(json.dumps(kw), flush=True)


t0 = time.time()
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", None)  # every compile cold
import polar_tpu  # noqa: F401  (relay preflight)
from polar_tpu.models.polar.pallas_scl import subtree_pallas
from polar_tpu.models.polar.construction import generate_5g_ranking
from polar_tpu.models.polar.scan_core import fast_schedule, split_fast_schedule

dev = jax.devices()[0]
emit(step="init", secs=round(time.time() - t0, 1), device=str(dev))


def aot_scl(b, L, bs, *, traced=False, cond=False, sched=None, tile=None,
            vmem_mib=None):
    """AOT-compile one SCL subtree kernel config; returns (secs, compiled)."""
    if vmem_mib:
        os.environ["POLAR_TPU_VMEM_LIMIT_MIB"] = str(vmem_mib)
    else:
        os.environ.pop("POLAR_TPU_VMEM_LIMIT_MIB", None)
    a = jax.ShapeDtypeStruct((1 << b, L, bs), jnp.float32)
    pm = jax.ShapeDtypeStruct((L, bs), jnp.float32)
    kw = dict(b=b, L=L, llr_max=30.0, mode="minsum", interpret=False,
              tile=tile)
    t = time.time()
    if sched is not None:
        lowered = subtree_pallas.lower(a, None, pm, sched_static=sched, **kw)
    elif traced:
        frz = jax.ShapeDtypeStruct((1 << b,), jnp.int32)
        lowered = subtree_pallas.lower(a, frz, pm, cond_leaves=cond, **kw)
    else:
        frz_static = tuple(int(x) for x in
                           (np.random.default_rng(0).random(1 << b) < 0.5))
        lowered = subtree_pallas.lower(a, None, pm, frz_static=frz_static,
                                       **kw)
    comp = lowered.compile()
    return round(time.time() - t, 1), comp


import numpy as np

n_ns, k_ns = 1024, 512
frozen_ns, _ = generate_5g_ranking(k_ns, n_ns)
mask_ns = np.zeros(n_ns, dtype=bool)
mask_ns[frozen_ns] = True


def ns_scheds(b):
    """The north-star code's per-subtree fast schedules at depth b."""
    units, _ = split_fast_schedule(mask_ns, b)
    return [u[2] for u in units if u[0] == "sub"]


for step in STEPS:
    if step == "init":
        continue

    elif step == "parcompile":
        # two medium traced kernels, different shapes (no jit-cache hits).
        # serial first, then two fresh shapes in parallel threads
        s1, _ = aot_scl(5, 8, 1024, traced=True, tile=128)
        s2, _ = aot_scl(5, 8, 2048, traced=True, tile=256)
        res = {}

        def work(tag, bs, tile):
            res[tag] = aot_scl(5, 8, bs, traced=True, tile=tile)[0]

        t = time.time()
        th1 = threading.Thread(target=work, args=("a", 4096, 512))
        th2 = threading.Thread(target=work, args=("b", 8192, 1024))
        th1.start(); th2.start(); th1.join(); th2.join()
        par = round(time.time() - t, 1)
        emit(step="parcompile", serial=[s1, s2],
             par_each=[res.get("a"), res.get("b")], par_wall=par,
             overlap=bool(par < res.get("a", 0) + res.get("b", 0) - 2))

    elif step.startswith("cold:"):
        # cold:<kind>:<b>[:tile] with kind in traced/cond/fast/static
        parts = step.split(":")
        kind, b = parts[1], int(parts[2])
        tile = int(parts[3]) if len(parts) > 3 else None
        bs = 8192
        try:
            if kind == "traced":
                secs, _ = aot_scl(b, 8, bs, traced=True, tile=tile)
            elif kind == "cond":
                secs, _ = aot_scl(b, 8, bs, traced=True, cond=True,
                                  tile=tile, vmem_mib=32)
            elif kind == "fast":
                scheds = ns_scheds(b)
                secs = []
                for sch in scheds:
                    s, _ = aot_scl(b, 8, bs, sched=tuple(sch), tile=tile)
                    secs.append(s)
            elif kind == "static":
                secs, _ = aot_scl(b, 8, bs, tile=tile)
            emit(step=step, secs=secs)
        except Exception as e:
            emit(step=step, error=f"{type(e).__name__}: {str(e)[:300]}")

    elif step.startswith("coldsc:"):
        # coldsc:<b>:<tile>:<bs> — cold-compile the SC whole-tree kernel
        # (rate-0-pruned static schedule, the sc_n64/sc_n256 stale-row
        # config) at a given batch tile; bisects the remote-compile-helper
        # HTTP 500 vs tile width.
        from polar_tpu.models.polar.pallas_scl import sc_subtree_pallas
        _, b_s, tile_s, bs_s = step.split(":")
        b_p, tile_p, bs_p = int(b_s), int(tile_s), int(bs_s)
        np_n = 1 << b_p
        frz_p, _ = generate_5g_ranking(np_n // 2, np_n)
        m_p = np.zeros(np_n, dtype=bool)
        m_p[frz_p] = True
        sched = tuple(fast_schedule(m_p, rep=False))
        a_p = jax.ShapeDtypeStruct((np_n, bs_p), jnp.float32)
        t = time.time()
        try:
            sc_subtree_pallas.lower(
                a_p, None, b=b_p, llr_max=30.0, mode="minsum",
                tile=tile_p or None, sched_static=sched,
                interpret=False).compile()
            emit(step=step, secs=round(time.time() - t, 1))
        except Exception as e:
            emit(step=step, error=f"{type(e).__name__}: {str(e)[:400]}")

    elif step.startswith("coldbp:"):
        # coldbp:<slice_min>[:<iters>] — cold-compile the fused BP kernel
        # at a given sliced-stage threshold (bisects the r4 sliced-sweep
        # compile-helper crash; 99 = pure rowwise, the r3 form)
        from polar_tpu.models.polar.pallas_bp import bp_pallas
        parts = step.split(":")
        os.environ["POLAR_TPU_BP_SLICE_MIN"] = parts[1]
        nit = int(parts[2]) if len(parts) > 2 else 20
        llr_s = jax.ShapeDtypeStruct((1024, 8192), jnp.float32)
        pr_s = jax.ShapeDtypeStruct((1024,), jnp.float32)
        t = time.time()
        try:
            bp_pallas.lower(llr_s, pr_s, S=10, num_iter=nit, check_every=2,
                            early_stop=True, mode="minsum", msf=0.9375,
                            llr_max=30.0, interpret=False).compile()
            emit(step=step, secs=round(time.time() - t, 1))
        except Exception as e:
            emit(step=step, error=f"{type(e).__name__}: {str(e)[:300]}")
        finally:
            jax.clear_caches()

    elif step.startswith("coldbpx:"):
        # coldbpx:<n>:<nit>:<es01>:<slice_min>:<tile> — finer BP-kernel
        # compile bisect (n, sweep count, early stop, slicing, tile)
        from polar_tpu.models.polar.pallas_bp import bp_pallas
        _, n_s, it_s, es_s, sl_s, tl_s = step.split(":")
        os.environ["POLAR_TPU_BP_SLICE_MIN"] = sl_s
        n_p, it_p = int(n_s), int(it_s)
        S_p = int(np.log2(n_p))
        llr_s = jax.ShapeDtypeStruct((n_p, 8192), jnp.float32)
        pr_s = jax.ShapeDtypeStruct((n_p,), jnp.float32)
        t = time.time()
        try:
            bp_pallas.lower(llr_s, pr_s, S=S_p, num_iter=it_p,
                            check_every=2, early_stop=es_s == "1",
                            mode="minsum", msf=0.9375, llr_max=30.0,
                            tile=int(tl_s) or None,
                            interpret=False).compile()
            emit(step=step, secs=round(time.time() - t, 1))
        except Exception as e:
            emit(step=step, error=f"{type(e).__name__}: {str(e)[:200]}")
        finally:
            jax.clear_caches()

    elif step.startswith("mini:"):
        # mini:<variant> — isolate which Mosaic construct crashes the
        # compile helper (the BP kernel uses all four; SCL kernels none):
        # fori (lax.fori_loop), bcast (constant-index-map input block),
        # roll (shift-concat), reduce (vector->(1,TB) min + scalar all)
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        from jax import lax
        variant = step.split(":")[1]
        TBm = 128

        def k_fori(x_ref, o_ref):
            def body(_i, c):
                o_ref[:] = o_ref[:] + x_ref[:]
                return c
            o_ref[:] = x_ref[:]
            lax.fori_loop(0, 5, body, 0)

        def k_bcast(x_ref, o_ref):
            o_ref[:] = x_ref[:] * 2.0

        def k_roll(x_ref, o_ref):
            x = x_ref[:]
            o_ref[:] = jnp.concatenate([x[8:], x[:8]], axis=0) + x

        def k_reduce(x_ref, o_ref):
            m = jnp.min(x_ref[:], axis=0, keepdims=True)
            o_ref[:] = jnp.broadcast_to(m, x_ref.shape)

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(0, 2, (64, 4 * TBm)), jnp.float32)
        oshape = jax.ShapeDtypeStruct((64, 4 * TBm), jnp.float32)
        bspec = pl.BlockSpec((64, TBm), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec((64, TBm), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
        def k_shift(x_ref, o_ref):
            rows = lax.broadcasted_iota(jnp.int32, x_ref.shape, 0)
            x = x_ref[:]
            acc = x
            for s in range(3):
                m = ((rows >> s) & 1) == 0
                acc = jnp.where(m, acc + x, acc - x)
            o_ref[:] = acc

        def k_scratchfori(x_ref, o_ref, scr):
            scr[:] = x_ref[:]

            def body(_i, c):
                scr[:] = scr[:] * 1.5 + x_ref[:]
                return c
            lax.fori_loop(0, 5, body, 0)
            o_ref[:] = scr[:]

        def k_sweepcombo(x_ref, o_ref, scr):
            rows = lax.broadcasted_iota(jnp.int32, x_ref.shape, 0)
            scr[:] = x_ref[:]

            def body(_i, c):
                for s in range(3):
                    d = 1 << s
                    xx = scr[:]
                    part = jnp.where(((rows >> s) & 1) == 0,
                                     jnp.concatenate([xx[d:], xx[:d]],
                                                     axis=0),
                                     jnp.concatenate([xx[-d:], xx[:-d]],
                                                     axis=0))
                    scr[:] = jnp.minimum(jnp.abs(xx), jnp.abs(part)) \
                        * jnp.sign(xx) * jnp.sign(part)
                return c
            lax.fori_loop(0, 4, body, 0)
            o_ref[:] = scr[:]

        def make_bigsweep(loop):
            NR = 1024

            def k_big(x_ref, o_ref, scr):
                rows = lax.broadcasted_iota(jnp.int32, (NR, TBm), 0)
                for j in range(NR // 64):
                    scr[64 * j:64 * (j + 1)] = x_ref[:]

                def sweep(_i, c):
                    for s in range(8):
                        d = 1 << s
                        xx = scr[:]
                        part = jnp.where(
                            ((rows >> s) & 1) == 0,
                            jnp.concatenate([xx[d:], xx[:d]], axis=0),
                            jnp.concatenate([xx[-d:], xx[:-d]], axis=0))
                        scr[:] = jnp.minimum(jnp.abs(xx), jnp.abs(part)) \
                            * jnp.sign(xx) * jnp.sign(part)
                    return c
                if loop:
                    lax.fori_loop(0, 4, sweep, 0)
                else:
                    sweep(0, 0)
                o_ref[:] = scr[0:64]
            return k_big

        kern = {"fori": k_fori, "bcast": k_bcast, "roll": k_roll,
                "reduce": k_reduce, "shift": k_shift,
                "scratchfori": k_scratchfori,
                "sweepcombo": k_sweepcombo,
                "bigsweep": make_bigsweep(True),
                "bigsweep_noloop": make_bigsweep(False)}[variant]
        scratch = ([pltpu.VMEM((64, TBm), jnp.float32)]
                   if variant in ("scratchfori", "sweepcombo") else [])
        if variant.startswith("bigsweep"):
            scratch = [pltpu.VMEM((1024, TBm), jnp.float32)]
        t = time.time()
        try:
            r = pl.pallas_call(
                kern, grid=(4,),
                in_specs=[cspec if variant == "bcast" else bspec],
                out_specs=bspec, out_shape=oshape,
                scratch_shapes=scratch)(x)
            r.block_until_ready()
            emit(step=step, secs=round(time.time() - t, 2))
        except Exception as e:
            emit(step=step, error=f"{type(e).__name__}: {str(e)[:6000]}")
        finally:
            jax.clear_caches()

    elif step == "bf16":
        # does Mosaic lower (a) bf16 arithmetic on (16, 128) tiles and
        # (b) dynamic-gather (take_along_axis) on a bf16 (8, TB) tile?
        # Gates the bf16 decode-datapath design (VERDICT r3 task 5).
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        from jax import lax

        def k_arith(x_ref, o_ref):
            x = x_ref[:]
            o_ref[:] = jnp.minimum(jnp.abs(x), 2.0) * jnp.sign(x) + x

        def k_gather(x_ref, p_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(x_ref[:], p_ref[:], axis=0)

        def k_i8(x_ref, o_ref):
            x = x_ref[:]
            o_ref[:] = jnp.where(x > 0, x, -x) + jnp.int8(1)

        rng = np.random.default_rng(0)
        xb = jnp.asarray(rng.normal(0, 2, (16, 256)), jnp.bfloat16)
        ptr = jnp.asarray(rng.integers(0, 8, (8, 256)), jnp.int32)
        x8 = jnp.asarray(rng.normal(0, 2, (8, 256)), jnp.bfloat16)
        xi = jnp.asarray(rng.integers(-8, 8, (32, 256)), jnp.int8)
        out = {}
        for name, kern, args, oshape in (
                ("arith", k_arith, (xb,),
                 jax.ShapeDtypeStruct((16, 256), jnp.bfloat16)),
                ("gather", k_gather, (x8, ptr),
                 jax.ShapeDtypeStruct((8, 256), jnp.bfloat16)),
                ("int8", k_i8, (xi,),
                 jax.ShapeDtypeStruct((32, 256), jnp.int8))):
            try:
                r = pl.pallas_call(kern, out_shape=oshape)(*args)
                r.block_until_ready()
                out[name] = "ok"
            except Exception as e:
                out[name] = f"{type(e).__name__}: {str(e)[:200]}"
        emit(step="bf16", **out)

    else:
        emit(step=step, error="unknown step")

emit(step="done", total_secs=round(time.time() - t0, 1))
