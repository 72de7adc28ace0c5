"""BP throughput experiments (VERDICT r3 task 4).

Measures the BP chain and the fused kernel alone at several iteration
counts / batch sizes in one TPU process, to split fixed overhead from
per-sweep cost and size the two-pass (compact-failures) design.

    python benchmarks/exp_bp.py it20:bs8192 it8:bs8192 kern:it20:bs8192 ...

Config grammar: it<num_iter>[:es0][:bs<bs>][:ce<check_every>]; prefix
``kern:`` times bp_pallas alone on fixed LLRs (no chain). Prints one JSON
line per config.
"""

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

import polar_tpu as pt
from polar_tpu.sim import count_errors

CONFIGS = sys.argv[1:] or ["it20:bs8192"]
K, N = 512, 1024


def parse(spec):
    kern = spec.startswith("kern:")
    parts = (spec[5:] if kern else spec).split(":")
    it = 20
    bs = 8192
    es = True
    ce = 2
    for p in parts:
        if p.startswith("it"):
            it = int(p[2:])
        elif p.startswith("bs"):
            bs = int(p[2:])
        elif p == "es0":
            es = False
        elif p.startswith("ce"):
            ce = int(p[2:])
    return kern, it, bs, es, ce


def run_cfg(spec):
    kern, it, bs, es, ce = parse(spec)
    frozen, _ = pt.generate_5g_ranking(K, N)
    e = jnp.float32(2.0)
    t_c = time.perf_counter()
    if kern:
        from polar_tpu.models.polar.pallas_bp import bp_pallas
        prior = np.zeros(N, dtype=np.float32)
        prior[frozen] = 30.0
        rng = np.random.default_rng(0)
        llr = jnp.asarray(rng.normal(0.5, 2, size=(N, bs))
                          .astype(np.float32))
        pr = jnp.asarray(prior)

        @jax.jit
        def step(x):
            return jnp.sum(bp_pallas(x, pr, S=10, num_iter=it,
                                     check_every=ce, early_stop=es,
                                     mode="minsum", msf=0.9375,
                                     llr_max=30.0))
        args = lambda i: (llr + i * 1e-6,)
    else:
        enc = pt.PolarEncoder(frozen, N)
        dec = pt.PolarBPDecoder(frozen, N, num_iter=it, early_stop=es,
                                check_every=ce)
        model = pt.SystemAWGNModel(N, K, enc, dec)

        @jax.jit
        def step(key):
            bb, bh = model.step(key, bs, e)
            return count_errors(bb, bh)
        args = lambda i: (jax.random.PRNGKey(i),)

    float(step(*args(0)))
    t_compile = time.perf_counter() - t_c
    float(sum(step(*args(90 + i)) for i in range(6)))
    iters = 16
    t0 = time.perf_counter()
    vals = [step(*args(i + 1)) for i in range(iters)]
    acc = float(sum(vals))
    dt = time.perf_counter() - t0
    return {"cfg": spec, "bits_per_s": round(K * bs * iters / dt, 1),
            "ms_per_batch": round(1e3 * dt / iters, 2),
            "compile_s": round(t_compile, 1), "acc": round(acc, 1)}


for spec in CONFIGS:
    try:
        print(json.dumps(run_cfg(spec)), flush=True)
    except Exception as ex:
        print(json.dumps({"cfg": spec, "error":
                          f"{type(ex).__name__}: {str(ex)[:2000]}"}),
              flush=True)
