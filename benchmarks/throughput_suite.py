"""Throughput survey across decoders/configs on the current device.

    python benchmarks/throughput_suite.py

Writes benchmarks/throughput.json: sustained decoded info bit/s for each
(decoder, n, config) through the full Monte-Carlo chain, measured with
pipelined batches (one device sync at the end).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/polar_tpu_xla"))
os.environ.setdefault("POLAR_TPU_LOWER_STAGES", "8")

import jax
import jax.numpy as jnp

import polar_tpu as pt
from polar_tpu.sim import count_errors


def chain_bps(model, k, bs, iters=16, ebno_db=2.0):
    @jax.jit
    def step(key, e):
        b, b_hat = model.step(key, bs, e)
        return count_errors(b, b_hat)

    float(step(jax.random.PRNGKey(0), jnp.float32(ebno_db)))  # warmup
    t0 = time.perf_counter()
    vals = [step(jax.random.PRNGKey(i + 1), jnp.float32(ebno_db))
            for i in range(iters)]
    errs = float(sum(vals))
    dt = time.perf_counter() - t0
    return k * bs * iters / dt, errs / (k * bs * iters)


def main():
    results = {"device": str(jax.devices()[0])}
    bs = int(os.environ.get("SUITE_BS", "8192"))

    configs = []
    for n in (256, 1024):
        k = n // 2
        frozen, _ = pt.generate_5g_ranking(k, n)
        enc = pt.PolarEncoder(frozen, n)
        configs += [
            (f"sc_n{n}", k, n, enc, pt.PolarSCDecoder(frozen, n)),
            (f"scl8_n{n}", k, n, enc,
             pt.PolarSCLDecoder(frozen, n, list_size=8)),
            (f"bp20_n{n}", k, n, enc,
             pt.PolarBPDecoder(frozen, n, num_iter=20)),
        ]
    # 5G CA-SCL rate-matched chain
    enc5 = pt.Polar5GEncoder(k=400, n=1000)
    dec5 = pt.Polar5GDecoder(enc5, dec_type="SCL", list_size=8)
    configs.append(("5g_cascl8_k400_n1000", 400, 1000, enc5, dec5))

    for name, k, n, enc, dec in configs:
        model = pt.SystemAWGNModel(n, k, enc, dec)
        try:
            bps, ber = chain_bps(model, k, bs)
            results[name] = {"info_bits_per_s": round(bps, 1),
                             "ber_at_2db": round(ber, 5), "bs": bs}
            print(f"{name:24s}: {bps/1e6:8.2f}M info bit/s "
                  f"(ber@2dB {ber:.4f})", flush=True)
        except Exception as e:  # keep surveying on per-config failure
            results[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            print(f"{name:24s}: FAILED {type(e).__name__}", flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "throughput.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
