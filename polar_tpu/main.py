"""CLI entry point: BER/BLER sweep of SC vs SCL polar decoding over AWGN.

Usage (mirrors the reference ``x_run_sn_polar/main.py``):

    python -m polar_tpu.main --k 32 --n 64 --algos [scl] --bs 100 --mc_iter 1

Always simulates SC; adds SCL-<list_size> when ``scl`` is in ``--algos``
(same behavior as the reference, ``main.py:47-51``). Frozen sets default to
the reference CLI's RM min-row-weight construction (``--construction rm``);
``--construction 5g`` uses the 5G NR reliability table instead.
"""

import math
import os

import numpy as np

from polar_tpu.config import PolarConfig, parse_config
from polar_tpu.models.polar.construction import (
    get_kern_frozen_bits, generate_5g_ranking, ARIKAN_F2)
from polar_tpu.models.polar.encode import PolarEncoder
from polar_tpu.models.polar.sc import PolarSCDecoder
from polar_tpu.models.polar.scl import PolarSCLDecoder
from polar_tpu.models.polar.bp import PolarBPDecoder
from polar_tpu.models.systems import SystemAWGNModel
from polar_tpu.plotting import PlotBER


def gen_code(c: PolarConfig, name: str, mode: str = "sc"):
    """Build (encoder, decoder, system model) for the configured code.

    ``--kern`` (reference ``x_run_sn_polar/d_kernels.py`` zoo) selects the
    kernel for BOTH construction and encoding. F2 runs the butterfly
    encoder + SC/SCL/BP decode chain; any other kernel runs the dense-G
    encoder (``c @ G % 2``, reference ``polar/enc.py:30-43``) with OSD as
    the decoder (the only universal one — the reference's SC/SCL are
    F2-only too)."""
    a = math.log(c.n, 2)
    assert a.is_integer(), "n must be a power of 2"
    kern_name = (c.kern or "F2").upper()
    if kern_name != "F2":
        from polar_tpu.models.polar.kernels import get_kernel
        kern = get_kernel(kern_name)
    else:
        kern = ARIKAN_F2
    if c.construction == "rm":
        _, _, frozen_pos = get_kern_frozen_bits(c.n, c.n - c.k, kern)
    elif c.construction == "rm-ref":
        # the reference CLI's EXACT frozen sets (its unstable-argsort tie
        # order, captured by running it; construction.py)
        from polar_tpu.models.polar.construction import get_ref_rm_frozen_bits
        frozen_pos = get_ref_rm_frozen_bits(c.n, c.n - c.k, kern_name)
    elif kern_name != "F2":
        raise ValueError(
            f"--construction {c.construction} is F2-only; use rm/rm-ref "
            f"with --kern {kern_name}")
    elif c.construction == "5g":
        frozen_pos, _ = generate_5g_ranking(c.k, c.n)
    elif c.construction == "ga":
        from polar_tpu.models.polar.construction import generate_ga_code
        frozen_pos, _ = generate_ga_code(c.k, c.n, c.design_snr)
    else:
        raise ValueError(f"unknown construction {c.construction!r}")
    f_mode = "minsum" if c.mode in ("max", "minsum") else "exact"
    if mode == "osd" or kern_name != "F2":
        from polar_tpu.models.polar.dense import (
            DenseKernelEncoder, DenseKernelDecoder)
        enc = DenseKernelEncoder(frozen_pos, c.n, kern)
        dec = DenseKernelDecoder(enc, t=c.osd_t)
        return [SystemAWGNModel(c.n, c.k, enc, dec), name]
    enc = PolarEncoder(frozen_pos, c.n)
    if mode == "sc":
        dec = PolarSCDecoder(frozen_pos, c.n, mode=f_mode)
    elif mode == "scl":
        dec = PolarSCLDecoder(frozen_pos, c.n, c.list_size, mode=f_mode,
                              use_fast_scl=c.fast_scl)
    elif mode == "bp":
        dec = PolarBPDecoder(frozen_pos, c.n, num_iter=c.bp_iter,
                             mode=f_mode)
    else:
        raise ValueError(f"unknown decode mode {mode!r}")
    model = SystemAWGNModel(c.n, c.k, enc, dec)
    return [model, name]


def main(c: PolarConfig = None):
    if c is None:
        c = parse_config()
    print(c.algos, type(c.algos))
    ebno_db = np.arange(0, c.snr_end, 0.5)
    if (c.kern or "F2").upper() != "F2":
        # non-F2 kernel: dense-G encode + OSD decode is the whole chain
        # (SC/SCL/BP are F2-only, as in the reference)
        codes_under_test = [gen_code(
            c, f"{c.kern.upper()} OSD-{c.osd_t}", mode="osd")]
    else:
        codes_under_test = [gen_code(c, "SC", mode="sc")]
        if "scl" in c.algos:
            codes_under_test.append(
                gen_code(c, f"SCL-{c.list_size}", mode="scl"))
        if "bp" in c.algos:
            codes_under_test.append(
                gen_code(c, f"BP-{c.bp_iter}", mode="bp"))

    from polar_tpu.utils.profiling import (decode_complexity, bp_complexity,
                                           complexity_line)

    ber_plot = PlotBER(f"Performance of Short Len Codes (k={c.k}, n={c.n})")
    for model, name in codes_under_test:
        print("\nRunning: " + name)
        if "OSD" in name:
            comp = None  # no closed-form meter for the OSD pattern sweep
        elif name.startswith("BP"):
            comp = bp_complexity(c.n, c.k, c.bp_iter)
        else:
            L = c.list_size if name.startswith("SCL") else 1
            dec = model.decoder
            fast = bool(getattr(dec, "use_fast_scl", False)) and L > 1
            comp = decode_complexity(
                c.n, c.k, L, fast=fast,
                frozen_mask=getattr(dec, "_frozen_mask", None),
                rate1=bool(getattr(dec, "fast_rate1", False)))
        if comp is not None:
            print(complexity_line(name, comp))
        ber_plot.simulate(
            model, ebno_dbs=ebno_db, batch_size=c.bs,
            target_block_errs=c.target_block_errs, legend=name,
            soft_estimates=False, max_mc_iter=c.mc_iter, add_bler=True,
            seed=c.seed)

    # render the BLER curves like the reference (main.py:60-76)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(16, 12))
    plt.xticks(fontsize=18)
    plt.yticks(fontsize=18)
    plt.title(f"SC vs scl (k={c.k},n={c.n})", fontsize=25)
    plt.grid(which="both")
    plt.xlabel(r"$E_b/N_0$ (dB)", fontsize=25)
    plt.ylabel(r"BLER", fontsize=25)
    for i, legend in enumerate(ber_plot.legend):
        if "BLER" in legend:
            linestyle = "--" if "SC " in legend or legend.startswith("SC") \
                else "-"
            plt.semilogy(ebno_db, ber_plot.ber[i], c=f"C{i}", label=legend,
                         linewidth=2, linestyle=linestyle)
    plt.legend(fontsize=20)
    plt.xlim([0, 4.5])
    os.makedirs(c.plot_dir, exist_ok=True)
    out = os.path.join(c.plot_dir, f"sc_mc_iter={c.mc_iter}_bs={c.bs}.png")
    plt.savefig(out)
    print(f"saved plot to {out}")


if __name__ == "__main__":
    main()
