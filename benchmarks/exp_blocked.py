"""L=16/32 blocked-kernel config sweep (VERDICT r3 task 2).

Measures full-chain info bit/s for SCL-16/32 at several subtree depths /
batch sizes / kernel variants in ONE TPU process (backend init through the
axon relay is expensive). Config grammar, comma-separated in argv:

    L16:b7:bs2048            fast-SCL specialized kernels at depth 7
    L16:b8:bs8192:vmem32     raised scoped-VMEM limit
    L16:b6:bs2048:traced     generic traced kernel (one executable)
    L16:b6:bs2048:plain      plain engine (no Hashemi pruning)

Prints one JSON line per config; failures ride the JSON (never dies).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/polar_tpu_xla"))

import jax
import jax.numpy as jnp

import polar_tpu as pt
from polar_tpu.sim import count_errors

CONFIGS = sys.argv[1:] or ["L16:b6:bs2048"]
K, N = 512, 1024


def run_cfg(spec: str):
    parts = spec.split(":")
    L = int(parts[0][1:])
    b = bs = None
    traced = False
    fast = True
    vmem = None
    for p in parts[1:]:
        if p.startswith("bs"):
            bs = int(p[2:])
        elif p.startswith("b"):
            b = int(p[1:])
        elif p == "traced":
            traced = True
        elif p == "plain":
            fast = False
        elif p.startswith("vmem"):
            vmem = int(p[4:])
    bs = bs or 2048

    for k_env, v in (("POLAR_TPU_LOWER_STAGES", b),
                     ("POLAR_TPU_TRACED_KERNEL", 1 if traced else None),
                     ("POLAR_TPU_VMEM_LIMIT_MIB", vmem)):
        if v is None:
            os.environ.pop(k_env, None)
        else:
            os.environ[k_env] = str(v)

    frozen, _ = pt.generate_5g_ranking(K, N)
    enc = pt.PolarEncoder(frozen, N)
    dec = pt.PolarSCLDecoder(frozen, N, list_size=L, use_fast_scl=fast)
    model = pt.SystemAWGNModel(N, K, enc, dec)

    @jax.jit
    def step(key, e):
        bb, bh = model.step(key, bs, e)
        return count_errors(bb, bh)

    e = jnp.float32(2.0)
    t0 = time.perf_counter()
    float(step(jax.random.PRNGKey(0), e))
    t_compile = time.perf_counter() - t0
    float(sum(step(jax.random.PRNGKey(90 + i), e) for i in range(6)))
    iters = max(8, min(24, (1 << 22) // bs))
    t0 = time.perf_counter()
    vals = [step(jax.random.PRNGKey(i + 1), e) for i in range(iters)]
    errs = float(sum(vals))
    dt = time.perf_counter() - t0
    bits = K * bs * iters
    return {"cfg": spec, "bits_per_s": round(bits / dt, 1),
            "compile_s": round(t_compile, 1), "bs": bs, "iters": iters,
            "ber": round(errs / bits, 5)}


for spec in CONFIGS:
    try:
        print(json.dumps(run_cfg(spec)), flush=True)
    except Exception as ex:
        print(json.dumps({"cfg": spec, "error":
                          f"{type(ex).__name__}: {str(ex)[:2000]}"}),
              flush=True)
