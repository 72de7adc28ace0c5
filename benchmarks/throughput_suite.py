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
# subtree depth comes from the VMEM-model auto choice (scan_core.
# resolve_lower_stages); POLAR_TPU_LOWER_STAGES overrides for experiments

import jax
import jax.numpy as jnp

import polar_tpu as pt
from polar_tpu.sim import count_errors


def chain_bps(model, k, bs, iters=16, ebno_db=2.0):
    if getattr(model, "requires_host", False):
        return chain_bps_host(model, k, bs, iters, ebno_db)

    @jax.jit
    def step(key, e):
        b, b_hat = model.step(key, bs, e)
        return count_errors(b, b_hat)

    float(step(jax.random.PRNGKey(0), jnp.float32(ebno_db)))  # compile
    # relay ramp: the first dispatch loop in a process runs ~50 ms/batch
    # regardless of content (~850 ms total); burn it before timing
    float(sum(step(jax.random.PRNGKey(90 + i), jnp.float32(ebno_db))
              for i in range(4)))
    t0 = time.perf_counter()
    vals = [step(jax.random.PRNGKey(i + 1), jnp.float32(ebno_db))
            for i in range(iters)]
    errs = float(sum(vals))
    dt = time.perf_counter() - t0
    return k * bs * iters / dt, errs / (k * bs * iters)


def chain_bps_host(model, k, bs, iters=16, ebno_db=2.0):
    """Host-orchestrated chains (hybrid SC/SCL), pipelined: dispatch every
    batch's front asynchronously, decode them with ONE mask sync and
    cross-batch SCL re-decodes, count jitted, sync once at the end."""
    from functools import partial
    dec = model.decoder
    count = jax.jit(count_errors)
    front = jax.jit(partial(model.front, batch_size=bs))
    e = jnp.float32(ebno_db)
    # prewarm: compile front/SC/SCL-bucket, then run ONE full-size window
    # so every shape the measured window uses (mask concat, llr concat,
    # chunk gathers, scatters, counters) is already compiled
    scl_batch = min(8192, bs * iters)
    if hasattr(dec, "prewarm"):
        dec.prewarm(bs, scl_capacity=scl_batch)

    def window(key0):
        pairs = [front(jax.random.PRNGKey(key0 + i), ebno_db=e)
                 for i in range(iters)]
        outs = dec.decode_pipelined([p[2] for p in pairs],
                                    scl_batch=scl_batch)
        return float(sum(count(p[0], o) for p, o in zip(pairs, outs)))

    window(1000)  # warmup at measurement shape
    t0 = time.perf_counter()
    errs = window(1)
    dt = time.perf_counter() - t0
    return k * bs * iters / dt, errs / (k * bs * iters)


def _stamp():
    """Measurement provenance: ISO date + current git revision."""
    import subprocess
    import datetime
    try:
        rev = subprocess.check_output(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            text=True).strip()
    except Exception:
        rev = "unknown"
    return f"{datetime.date.today().isoformat()} @{rev}"


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
    # the reference CLI's default blocklength (n=64); short blocks are
    # dispatch-bound so the row runs at 8x batch
    frozen64, _ = pt.generate_5g_ranking(32, 64)
    configs.append(("sc_n64", 32, 64, pt.PolarEncoder(frozen64, 64),
                    pt.PolarSCDecoder(frozen64, 64), 2.0, 65536))

    # BP two-pass serving path (r4): cheap 8-sweep first pass + compacted
    # full-budget re-decode of G-matrix failures; bit-identical to the
    # single-pass decoder (tests/test_bp.py)
    frozen1k0, _ = pt.generate_5g_ranking(512, 1024)
    configs.append(("bp20_n1024_2pass", 512, 1024,
                    pt.PolarEncoder(frozen1k0, 1024),
                    pt.PolarBPDecoder(frozen1k0, 1024, num_iter=20,
                                      two_pass=True, first_pass_iters=8),
                    2.0, 8192))
    # bf16 message lattice (r5): halves the HBM traffic that binds the
    # XLA BP engine (docs/PERFORMANCE.md BP roofline); opt-in, BER within
    # MC noise of f32 (tests/test_bp.py)
    configs.append(("bp20_n1024_bf16", 512, 1024,
                    pt.PolarEncoder(frozen1k0, 1024),
                    pt.PolarBPDecoder(frozen1k0, 1024, num_iter=20,
                                      msg_dtype=jnp.bfloat16),
                    2.0, 8192))

    # larger list sizes at the north-star blocklength (blocked Pallas
    # kernel — lists of (8, TB) blocks, see pallas_scl)
    frozen1k, _ = pt.generate_5g_ranking(512, 1024)
    enc1k = pt.PolarEncoder(frozen1k, 1024)
    for Lbig in (16, 32):
        configs.append((f"scl{Lbig}_n1024", 512, 1024, enc1k,
                        pt.PolarSCLDecoder(frozen1k, 1024, list_size=Lbig),
                        2.0, 2048))

    # fast-SCL (Hashemi rate-0/rep pruned schedule, the reference my_sn
    # default): same chains through scan_core.scl_sweep_hybrid_fast
    for Lf, bsf in ((8, 8192), (16, 2048), (32, 2048)):
        configs.append((f"scl{Lf}_n1024_fast", 512, 1024, enc1k,
                        pt.PolarSCLDecoder(frozen1k, 1024, list_size=Lf,
                                           use_fast_scl=True),
                        2.0, bsf))
    # the bench.py LEADER config: b=9 fast under a 64 MiB scoped-VMEM
    # limit (TB=512 batch tile — the limit sets the tile; r4 mislabeled
    # the 32 MiB variant "whole-tree b=10", and the true b=10 kernel
    # measures ~274M, slower than either)
    configs.append(("scl8_n1024_fast_v64", 512, 1024, enc1k,
                    pt.PolarSCLDecoder(frozen1k, 1024, list_size=8,
                                       use_fast_scl=True),
                    2.0, 8192, False,
                    {"POLAR_TPU_LOWER_STAGES": "9",
                     "POLAR_TPU_VMEM_LIMIT_MIB": "64"}))
    # fast_rate1 (r5 bench leader): Hashemi rate-1 'o' node shortcuts in
    # the specialized kernels (forks 512 -> 310 at L=8); explicit flag so
    # the row is env-independent
    configs.append(("scl8_n1024_fast_r1", 512, 1024, enc1k,
                    pt.PolarSCLDecoder(frozen1k, 1024, list_size=8,
                                       use_fast_scl=True, fast_rate1=True),
                    2.0, 8192, False,
                    {"POLAR_TPU_LOWER_STAGES": "9",
                     "POLAR_TPU_VMEM_LIMIT_MIB": "64"}))
    for Lf, bsf in ((16, 2048), (32, 2048)):
        configs.append((f"scl{Lf}_n1024_fast_r1", 512, 1024, enc1k,
                        pt.PolarSCLDecoder(frozen1k, 1024, list_size=Lf,
                                           use_fast_scl=True,
                                           fast_rate1=True),
                        2.0, bsf))

    # OSD-2 on a (64, 128) code (VERDICT r2 task 4): codeword-estimate
    # chain (cw_estimates=True); 2144 patterns swept by the padded scan
    from polar_tpu.models.osd import OSDecoder
    frozen_o, _ = pt.generate_5g_ranking(64, 128)
    enc_o = pt.PolarEncoder(frozen_o, 128)
    configs.append(("osd2_k64_n128", 64, 128, enc_o,
                    OSDecoder(t=2, encoder=enc_o, pattern_chunk=1024),
                    2.0, 1024, True))

    # 5G CA-SCL rate-matched chain
    enc5 = pt.Polar5GEncoder(k=400, n=1000)
    dec5 = pt.Polar5GDecoder(enc5, dec_type="SCL", list_size=8)
    configs.append(("5g_cascl8_k400_n1000", 400, 1000, enc5, dec5))
    # hybrid SC-first CA-SCL: same chain, SCL only on CRC failures
    # (fast-SCL re-decode — the hybrid path is serving-oriented)
    dec5h = pt.Polar5GDecoder(enc5, dec_type="hybSCL", list_size=8,
                              use_fast_scl=True)
    configs.append(("5g_hybscl8_k400_n1000", 400, 1000, enc5, dec5h,
                    2.0, 32768))

    # hybrid at the north-star blocklength: CRC-in-chain composite
    # (payload k' = k - 11; the SC accept test needs valid CRC payloads)
    from polar_tpu.ops.crc import CRCEncoder, crc_polynomial
    n_h, k_h = 1024, 512
    frozen_h, _ = pt.generate_5g_ranking(k_h, n_h)
    _, crc_len = crc_polynomial("CRC11")
    crc_enc = CRCEncoder("CRC11", k=k_h - crc_len)
    polar_enc = pt.PolarEncoder(frozen_h, n_h)

    class _CrcPolarEncoder:
        def __call__(self, bits):
            return polar_enc(crc_enc(bits))

    class _PayloadHybrid:
        requires_host = True

        def __init__(self, ebno=None):
            self._hyb = pt.HybridSCLDecoder(frozen_h, n_h, list_size=8,
                                            crc_degree="CRC11",
                                            use_fast_scl=True)

        def __call__(self, llr):
            return self._hyb(llr)[..., :k_h - crc_len]

        def decode_pipelined(self, llr_batches, scl_batch=8192):
            return [u[..., :k_h - crc_len] for u in
                    self._hyb.decode_pipelined(llr_batches,
                                               scl_batch=scl_batch)]

        def prewarm(self, bs, scl_capacity=None):
            self._hyb.prewarm(bs, scl_capacity)

    # hybrid rows run at 4x batch: the SC-dominated window is dispatch-
    # bound, so bigger programs amortize the ~25 ms/program relay overhead
    # (measured: 54.6M @ bs=8192 -> 122.5M @ bs=32768 at 2 dB; 65536 OOMs)
    for snr in (2.0, 3.0):
        configs.append((f"hybscl8_n1024_{snr:.0f}db", k_h - crc_len, n_h,
                        _CrcPolarEncoder(), _PayloadHybrid(), snr, 32768))

    # SUITE_FILTER=substr re-measures matching rows only (others keep
    # their previous values from benchmarks/throughput.json)
    filt = os.environ.get("SUITE_FILTER", "")
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "throughput.json")
    prev = {}
    if os.path.exists(out):
        with open(out) as fh:
            prev = json.load(fh)
    if filt:
        results.update(prev)
        results["device"] = str(jax.devices()[0])

    for cfg in configs:
        name, k, n, enc, dec = cfg[:5]
        if filt and filt not in name:
            continue
        ebno = cfg[5] if len(cfg) > 5 else 2.0
        row_bs = cfg[6] if len(cfg) > 6 else bs
        cw_est = cfg[7] if len(cfg) > 7 else False
        # optional per-row env overrides (read at trace time by the
        # decode engines), restored after the row either way
        env_over = cfg[8] if len(cfg) > 8 else None
        saved_env = {}
        if env_over:
            for ek, ev in env_over.items():
                saved_env[ek] = os.environ.get(ek)
                os.environ[ek] = str(ev)
        model = pt.SystemAWGNModel(n, k, enc, dec, cw_estimates=cw_est)
        try:
            bps, ber = chain_bps(model, k, row_bs, ebno_db=ebno)
            results[name] = {"info_bits_per_s": round(bps, 1),
                             f"ber_at_{ebno:.0f}db": round(ber, 5),
                             "bs": row_bs,
                             "measured_at": _stamp()}
            print(f"{name:24s}: {bps/1e6:8.2f}M info bit/s "
                  f"(ber@{ebno:.0f}dB {ber:.4f})", flush=True)
        except Exception as e:  # keep surveying on per-config failure;
            # a previously measured value is NOT discarded — it is kept
            # marked stale so one transient compile/relay crash cannot
            # wipe a valid number from the survey
            row = {"error": f"{type(e).__name__}: {e}"[:200]}
            old = prev.get(name)
            if isinstance(old, dict) and "info_bits_per_s" in old:
                row = dict(old)
                row["stale"] = True
                row["error"] = f"{type(e).__name__}: {e}"[:200]
            results[name] = row
            print(f"{name:24s}: FAILED {type(e).__name__}", flush=True)
        finally:
            for ek, ev in saved_env.items():
                if ev is None:
                    os.environ.pop(ek, None)
                else:
                    os.environ[ek] = ev

    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
