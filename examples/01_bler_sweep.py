"""BER/BLER sweep: SC vs SCL-8 vs BP on a 5G-ranked polar code.

The library equivalent of the reference CLI run
(`python -m polar_tpu.main --k 64 --n 128 --algos [scl,bp]
--construction 5g`). Runs on CPU, a single TPU chip, or a mesh unchanged;
pass --k 512 --n 1024 on TPU for the north-star code.

    python examples/01_bler_sweep.py [--k 64 --n 128]
"""

import os
import sys

# runnable without installation: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np

import polar_tpu as pt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--n", type=int, default=128)
    args = ap.parse_args()
    k, n = args.k, args.n
    frozen, _ = pt.generate_5g_ranking(k, n)
    enc = pt.PolarEncoder(frozen, n)
    ebno_dbs = np.arange(1.0, 3.5, 0.5)

    plot = pt.PlotBER(f"Polar ({n},{k}) QPSK/AWGN")
    for name, dec in (
            ("SC", pt.PolarSCDecoder(frozen, n)),
            ("SCL-8", pt.PolarSCLDecoder(frozen, n, list_size=8)),
            ("BP-20", pt.PolarBPDecoder(frozen, n, num_iter=20))):
        model = pt.SystemAWGNModel(n, k, enc, dec)
        ber, bler = plot.simulate(model, ebno_dbs, batch_size=2048,
                                  max_mc_iter=50, target_block_errs=500,
                                  add_bler=True, legend=name)
        print(f"{name}: BER  {np.asarray(ber).round(5)}")
        print(f"{name}: BLER {np.asarray(bler).round(5)}")

    fig, _ = plot.plot()
    fig.savefig("bler_sweep.png", bbox_inches="tight")
    print("wrote bler_sweep.png")


if __name__ == "__main__":
    main()
