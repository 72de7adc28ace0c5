"""BLER parity validation vs BASELINE.md (reference measured curves).

Runs the reference CLI's exact configuration — k=32, n=64, RM min-weight
frozen sets, QPSK/AWGN, min-sum SC and SCL-8 — at high Monte-Carlo depth
and writes a JSON table next to BASELINE.md's rows.

    python benchmarks/bler_validation.py [--points 0:4.5:0.5] [--blocks 2000]

Note (PARITY.md quirk 3): the reference breaks RM row-weight ties with
torch.argsort's unstable order; we freeze the lower index. Same rule,
slightly better code — our BLER is expected AT OR BELOW the baseline rows.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=2000,
                    help="target block errors per SNR point")
    ap.add_argument("--bs", type=int, default=4096)
    ap.add_argument("--mc_iter", type=int, default=400)
    ap.add_argument("--out", default="benchmarks/bler_validation.json")
    args = ap.parse_args()

    k, n = 32, 64
    _, _, frozen = get_kern_frozen_bits(n, n - k, ARIKAN_F2)
    enc = pt.PolarEncoder(frozen, n)
    ebno = np.arange(0.0, 5.0, 0.5)

    results = {}
    for name, dec in (
            ("sc", pt.PolarSCDecoder(frozen, n, mode="minsum")),
            ("scl8", pt.PolarSCLDecoder(frozen, n, list_size=8,
                                        mode="minsum"))):
        model = pt.SystemAWGNModel(n, k, enc, dec)
        ber, bler = pt.sim_ber(model, ebno, batch_size=args.bs,
                               max_mc_iter=args.mc_iter,
                               target_block_errs=args.blocks,
                               early_stop=False, verbose=True, seed=42)
        results[name] = {
            "ebno_db": ebno.tolist(),
            "ber": ber.tolist(),
            "bler": bler.tolist(),
            "baseline_bler": [BASELINE[name].get(float(e)) for e in ebno],
        }

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"\nwrote {args.out}")
    for name, r in results.items():
        for e, ours, base in zip(r["ebno_db"], r["bler"],
                                 r["baseline_bler"]):
            flag = ""
            if base is not None and base > 0 and ours > 2.0 * base + 0.02:
                flag = "  <-- WORSE than baseline"
            print(f"{name:5s} {e:4.1f} dB: bler={ours:.4f} "
                  f"baseline={base}{flag}")


if __name__ == "__main__":
    main()
