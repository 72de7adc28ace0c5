"""BLER parity validation vs BASELINE.md (reference measured curves).

Runs the reference CLI's exact configuration — k=32, n=64, RM min-weight
frozen sets, QPSK/AWGN, min-sum SC and SCL-8 — at high Monte-Carlo depth
and writes a JSON table next to BASELINE.md's rows.

    python benchmarks/bler_validation.py [--points 0:4.5:0.5] [--blocks 2000]

Two distinct acceptance contracts:

* RM-construction chains (k32): the reference breaks RM row-weight ties
  with torch.argsort's unstable order; we freeze the lower index
  (PARITY.md quirk 3). Same rule, slightly better code — our BLER is
  expected AT OR BELOW the baseline rows.
* Identical-code chains (northstar/5g, 5G-table frozen sets): our decoder
  is fixture-bit-exact to the reference on identical LLRs, so the curves
  must be STATISTICALLY EQUAL — each point within Monte-Carlo confidence
  of the baseline (the baseline's own block count bounds that CI; rows
  carry baseline_blocks for exactly this reason). Measured 2026-08-18 at
  4000 baseline blocks/point: ratios 0.92-1.16 across 1.0-2.5 dB, all
  within ~2 sigma.
"""

import argparse
import json
import os
import sys

import numpy as np

# runnable as `python benchmarks/bler_validation.py` from the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import polar_tpu as pt
from polar_tpu.models.polar.construction import (get_kern_frozen_bits,
                                                 ARIKAN_F2)

BASELINE = {  # BASELINE.md, measured from the reference (k=32, n=64)
    "sc": {0.0: 0.82, 0.5: 0.75, 1.0: 0.53, 1.5: 0.48, 2.0: 0.30,
           2.5: 0.29, 3.0: 0.15, 3.5: 0.16, 4.0: 0.06, 4.5: 0.01},
    "scl8": {0.0: 0.57, 0.5: 0.42, 1.0: 0.21, 1.5: 0.25, 2.0: 0.14,
             2.5: 0.07, 3.0: 0.07, 3.5: 0.01, 4.0: 0.0, 4.5: 0.0},
}


def _ref_rows(which):
    """Baseline rows measured from the reference by ref_baseline_bler.py
    (committed JSON; see that module for method)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "ref_baseline_bler.json")
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        entry = json.load(fh).get(which)
    return None if entry is None else entry["rows"]


def _baseline_cols(baseline_rows, ebno):
    """(baseline_bler, baseline_blocks) columns for the given Eb/N0 grid,
    all-None when no baseline rows exist."""
    if baseline_rows is None:
        return [None] * len(ebno), [None] * len(ebno)
    rows = [baseline_rows.get(f"{float(e):.1f}", {}) for e in ebno]
    return ([r.get("bler") for r in rows], [r.get("blocks") for r in rows])


def _run(model, ebno, args, name, baseline_rows, results,
         bound_factor=1.0):
    ber, bler = pt.sim_ber(model, ebno, batch_size=args.bs,
                           max_mc_iter=args.mc_iter,
                           target_block_errs=args.blocks,
                           early_stop=False, verbose=True, seed=42)
    base, base_blocks = _baseline_cols(baseline_rows, ebno)
    results[name] = {
        "ebno_db": np.asarray(ebno, dtype=float).tolist(),
        "ber": ber.tolist(), "bler": bler.tolist(),
        "baseline_bler": base, "baseline_blocks": base_blocks,
        "bound_factor": bound_factor,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=2000,
                    help="target block errors per SNR point")
    ap.add_argument("--bs", type=int, default=4096)
    ap.add_argument("--mc_iter", type=int, default=400)
    ap.add_argument("--chains",
                    default="k32,northstar,northstar_fast,5g,sc_n1024,"
                            "bp,hybscl8",
                    help="comma list: k32, northstar, northstar_fast, 5g, "
                         "sc_n1024, bp, hybscl8")
    ap.add_argument("--out", default="benchmarks/bler_validation.json")
    ap.add_argument("--merge-baselines", action="store_true",
                    help="no MC runs: refresh baseline_bler/baseline_blocks "
                         "columns of the existing --out rows from "
                         "ref_baseline_bler.json (they are copies of the "
                         "reference rows by design), re-check bounds, exit")
    args = ap.parse_args()
    chains = set(args.chains.split(","))

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as fh:  # partial re-runs keep other chains
            results.update(json.load(fh))

    if args.merge_baselines:
        row_to_ref = {"scl8_n1024": "northstar",
                      "scl8_n1024_fast": "northstar",
                      "5g_cascl8_k400_n1000": "fiveg",
                      "hybscl8_5g_k400_n1000": "fiveg",
                      "sc_n1024": "sc",
                      "sc": "sc_k32", "scl8": "scl8_k32"}
        for name, which in row_to_ref.items():
            r, rows = results.get(name), _ref_rows(which)
            if r is None or rows is None:
                continue
            r["baseline_bler"], r["baseline_blocks"] = _baseline_cols(
                rows, r["ebno_db"])
        chains = set()  # fall through to write + bound check only

    if "k32" in chains:
        k, n = 32, 64
        _, _, frozen = get_kern_frozen_bits(n, n - k, ARIKAN_F2)
        enc = pt.PolarEncoder(frozen, n)
        ebno = np.arange(0.0, 5.0, 0.5)
        for name, dec in (
                ("sc", pt.PolarSCDecoder(frozen, n, mode="minsum")),
                ("scl8", pt.PolarSCLDecoder(frozen, n, list_size=8,
                                            mode="minsum"))):
            # prefer the deep (>=4000 blocks/point) reference baseline
            # measured by ref_baseline_bler.py --chains sc_k32,scl8_k32
            # (VERDICT r3 task 7); fall back to BASELINE.md's original
            # 100-block rows when the artifact is absent
            rows = _ref_rows(f"{name}_k32")
            shallow = rows is None
            if shallow:
                rows = {f"{e:.1f}": {"bler": BASELINE[name].get(float(e))}
                        for e in ebno}
            _run(pt.SystemAWGNModel(n, k, enc, dec), ebno, args, name,
                 rows, results)
            if shallow:
                results[name]["baseline_blocks"] = [100] * len(ebno)

    if "northstar" in chains:
        # bench.py's exact config: 5G-table frozen set, min-sum SCL-8
        k, n = 512, 1024
        frozen, _ = pt.generate_5g_ranking(k, n)
        model = pt.SystemAWGNModel(n, k, pt.PolarEncoder(frozen, n),
                                   pt.PolarSCLDecoder(frozen, n,
                                                      list_size=8))
        _run(model, [1.0, 1.5, 2.0, 2.5], args, "scl8_n1024",
             _ref_rows("northstar"), results)

    if "northstar_fast" in chains:
        # fast-SCL (Hashemi rate-0/rep pruning — the reference my_sn
        # default and the bench ladder leader). Pruning reorders forks, so
        # it is NOT bit-identical to the plain engine; it needs its own
        # quality row vs the same reference baseline.
        k, n = 512, 1024
        frozen, _ = pt.generate_5g_ranking(k, n)
        model = pt.SystemAWGNModel(n, k, pt.PolarEncoder(frozen, n),
                                   pt.PolarSCLDecoder(frozen, n,
                                                      list_size=8,
                                                      use_fast_scl=True))
        _run(model, [1.0, 1.5, 2.0, 2.5], args, "scl8_n1024_fast",
             _ref_rows("northstar"), results)

    if "northstar_r1" in chains:
        # fast_rate1 (Hashemi rate-1 node shortcuts — the r5 bench
        # leader): the flip set is exact w.r.t. the fast contract, so
        # the curve must sit on the same reference baseline
        k, n = 512, 1024
        frozen, _ = pt.generate_5g_ranking(k, n)
        model = pt.SystemAWGNModel(n, k, pt.PolarEncoder(frozen, n),
                                   pt.PolarSCLDecoder(frozen, n,
                                                      list_size=8,
                                                      use_fast_scl=True,
                                                      fast_rate1=True))
        _run(model, [1.0, 1.5, 2.0, 2.5], args, "scl8_n1024_fast_r1",
             _ref_rows("northstar"), results)

    if "5g" in chains:
        # mode="exact": the reference 5G chain (my_sn SCL) runs the exact
        # boxplus f, so the parity row must too — the product's min-sum
        # default is a deliberately cheaper decoder (~0.05-0.1 dB at low
        # SNR) whose quality contract is covered by the northstar rows
        # (min-sum vs min-sum)
        enc5 = pt.Polar5GEncoder(k=400, n=1000)
        dec5 = pt.Polar5GDecoder(enc5, dec_type="SCL", list_size=8,
                                 mode="exact")
        _run(pt.SystemAWGNModel(1000, 400, enc5, dec5),
             [1.0, 1.5, 2.0, 2.5, 3.0], args, "5g_cascl8_k400_n1000",
             _ref_rows("fiveg"), results)

    if "sc_n1024" in chains:
        # SC on the north-star code vs the reference SC decoder
        # (x_run_sn_polar/polar/polar_sc.py, min-sum like-for-like); also
        # the decoder-class baseline for the BP chain below
        k, n = 512, 1024
        frozen, _ = pt.generate_5g_ranking(k, n)
        model = pt.SystemAWGNModel(n, k, pt.PolarEncoder(frozen, n),
                                   pt.PolarSCDecoder(frozen, n))
        _run(model, [1.0, 1.5, 2.0, 2.5, 3.0], args, "sc_n1024",
             _ref_rows("sc"), results)

    if "bp" in chains:
        # BP-20 at n=1024 (VERDICT r2 task 5): decoder-class baseline is
        # the sc_n1024 row (SC ~ BP quality class); accept within 2x + MC
        # noise — BP's fixed point is not SC's
        k, n = 512, 1024
        frozen, _ = pt.generate_5g_ranking(k, n)
        sc_rows = None
        if "sc_n1024" in results:
            r = results["sc_n1024"]
            # effective blocks per point ~ target errors / bler (the sweep
            # stops at target_block_errs), capped at the full MC budget
            sc_rows = {
                f"{e:.1f}": {
                    "bler": b,
                    "blocks": int(min(args.bs * args.mc_iter,
                                      args.blocks / max(b, 1e-9)))}
                for e, b in zip(r["ebno_db"], r["bler"])}
        model = pt.SystemAWGNModel(n, k, pt.PolarEncoder(frozen, n),
                                   pt.PolarBPDecoder(frozen, n,
                                                     num_iter=20))
        _run(model, [1.0, 1.5, 2.0, 2.5, 3.0], args, "bp_n1024", sc_rows,
             results, bound_factor=2.0)

    if "hybscl8" in chains:
        # hybSCL on the 5G chain (VERDICT r2 task 5): SC-first decode with
        # CA-SCL re-decode of CRC failures must hold the reference CA-SCL
        # BLER (the SC-pass false-positive rate is the only quality delta)
        enc5 = pt.Polar5GEncoder(k=400, n=1000)
        dech = pt.Polar5GDecoder(enc5, dec_type="hybSCL", list_size=8,
                                 mode="exact")  # like-for-like (see "5g")
        _run(pt.SystemAWGNModel(1000, 400, enc5, dech),
             [1.0, 1.5, 2.0, 2.5, 3.0], args, "hybscl8_5g_k400_n1000",
             _ref_rows("fiveg"), results)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"\nwrote {args.out}")
    worse = 0
    for name, r in results.items():
        factor = r.get("bound_factor", 1.0)
        for e, ours, base, nb in zip(r["ebno_db"], r["bler"],
                                     r["baseline_bler"],
                                     r.get("baseline_blocks",
                                           [None] * 99)):
            if base is None:
                continue
            # accept at-or-below factor*baseline within the baseline's own
            # 3-sigma MC noise (the reference rows are far shallower than
            # ours); a zero-error baseline row only bounds BLER below
            # ~3/blocks (rule of three), not at 0
            if nb and base > 0:
                bound = factor * base + 3 * np.sqrt(base * (1 - base) / nb)
            elif nb:
                bound = max(factor, 1.0) * 3.0 / nb
            else:
                bound = factor * base
            flag = ""
            if ours > bound + 1e-3:
                flag = "  <-- WORSE than baseline"
                worse += 1
            print(f"{name:22s} {e:4.1f} dB: bler={ours:.4f} "
                  f"baseline={base}{flag}")
    if worse:
        raise SystemExit(f"{worse} points worse than baseline")


if __name__ == "__main__":
    main()
