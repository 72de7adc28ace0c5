"""Generate golden-parity fixtures by *running* the reference implementation
(`/root/reference`, read-only) on fixed random inputs.

The fixtures (``tests/fixtures/*.npz``) are committed so the test suite does
not need the reference checkout at test time. Re-run this script only when
the fixture format changes:

    python tests/make_fixtures.py

Nothing from the reference is copied — this script only *calls* its public
decoders/encoders (the same way SURVEY.md section 4 describes the original
author's own cross-decoder equivalence testing) and records inputs/outputs.
"""

import os
import sys

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "fixtures")


def main():
    sys.path.insert(0, REF)                         # my_sn
    sys.path.insert(0, os.path.join(REF, "x_run_sn_polar"))  # polar/*
    import torch as tc

    # the reference CRC has a latent `self.device` bug (my_sn/fec/crc.py:81,
    # documented in SURVEY.md section 2.4); give the class the attribute the
    # author intended so the 5G chain can run.
    import my_sn.fec.crc as ref_crc
    ref_crc.CRCEncoder.device = "cpu"
    ref_crc.CRCDecoder.device = "cpu"

    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(20260816)
    tc.manual_seed(0)

    # ------------------------------------------------------------------
    # 1) SC / SCL decoder parity on identical LLR inputs
    # ------------------------------------------------------------------
    from polar.polar_sc import SC_Dec as XRunSC
    from polar.polar_scl import SCL_Dec as XRunSCL
    from my_sn.fec.polar.dec import SC_Dec as MySnSC, SCL_Dec as MySnSCL
    from my_sn.fec.polar.utils import generate_5g_ranking as ref_5g_ranking

    dec_fix = {}
    for n in (64, 256):
        k = n // 2
        frozen_pos, info_pos = ref_5g_ranking(k, n)
        frozen_pos = np.asarray(frozen_pos, dtype=np.int64)
        bs = 64
        llr = rng.normal(0.0, 4.0, size=(bs, n)).astype(np.float32)
        llr_t = tc.tensor(llr)

        sc_minsum = XRunSC(frozen_pos, n, mode="max")(llr_t).numpy()
        sc_exact = MySnSC(frozen_pos, n)(llr_t).numpy()
        scl_minsum = XRunSCL(frozen_pos, n, list_size=4)(llr_t).numpy()
        scl_exact = MySnSCL(frozen_pos, n, list_size=4)(llr_t).numpy()
        scl_exact_l8 = MySnSCL(frozen_pos, n, list_size=8)(llr_t).numpy()
        scl_nofast = MySnSCL(frozen_pos, n, list_size=4,
                             use_fast_scl=False)(llr_t).numpy()
        # CRC-aided: info word = payload + CRC11 parity
        scl_crc = MySnSCL(frozen_pos, n, list_size=8,
                          crc_degree="CRC11")(llr_t).numpy()
        dec_fix.update({
            f"n{n}_frozen_pos": frozen_pos,
            f"n{n}_llr": llr,
            f"n{n}_sc_minsum": sc_minsum,
            f"n{n}_sc_exact": sc_exact,
            f"n{n}_scl4_minsum": scl_minsum,
            f"n{n}_scl4_exact": scl_exact,
            f"n{n}_scl8_exact": scl_exact_l8,
            f"n{n}_scl4_exact_nofast": scl_nofast,
            f"n{n}_scl8_crc11": scl_crc,
        })
    np.savez_compressed(os.path.join(OUT, "decoders.npz"), **dec_fix)
    print("wrote decoders.npz")

    # ------------------------------------------------------------------
    # 2) 5G ranking / RM construction
    # ------------------------------------------------------------------
    from my_sn.fec.polar.utils import generate_rm_code as ref_rm
    cons_fix = {}
    for (k, n) in ((32, 64), (12, 32), (100, 256), (512, 1024), (37, 128)):
        fp, ip = ref_5g_ranking(k, n)
        cons_fix[f"rank_k{k}_n{n}_frozen"] = np.asarray(fp)
        cons_fix[f"rank_k{k}_n{n}_info"] = np.asarray(ip)
    for (r, m) in ((1, 3), (2, 5), (3, 7)):
        fp, ip, n, k, d = ref_rm(r, m)
        cons_fix[f"rm_r{r}_m{m}_frozen"] = np.asarray(fp)
        cons_fix[f"rm_r{r}_m{m}_meta"] = np.asarray([n, k, d])
    np.savez_compressed(os.path.join(OUT, "construction.npz"), **cons_fix)
    print("wrote construction.npz")

    # ------------------------------------------------------------------
    # 3) CRC encoder parity
    # ------------------------------------------------------------------
    crc_fix = {}
    for deg in ("CRC24A", "CRC24B", "CRC24C", "CRC16", "CRC11", "CRC6"):
        k = 40
        enc = ref_crc.CRCEncoder(deg, k=k)
        bits = rng.integers(0, 2, size=(8, k)).astype(np.float32)
        out = enc(tc.tensor(bits)).numpy()
        crc_fix[f"{deg}_in"] = bits
        crc_fix[f"{deg}_out"] = out
    np.savez_compressed(os.path.join(OUT, "crc.npz"), **crc_fix)
    print("wrote crc.npz")

    # ------------------------------------------------------------------
    # 4) Mapper / Demapper parity (QPSK and 16-QAM)
    # ------------------------------------------------------------------
    from my_sn.trans.mapping import QamConstell, Mapper, Demapper
    map_fix = {}
    for m in (2, 4):
        const = QamConstell(m)
        mapper = Mapper(constell=const)
        demapper = Demapper(const)
        bits = rng.integers(0, 2, size=(6, 4 * m)).astype(np.float32)
        x = mapper(tc.tensor(bits))
        no = 0.35
        noise = rng.normal(0.0, np.sqrt(no / 2), size=(2,) + tuple(x.shape))
        y = x + tc.tensor(noise[0] + 1j * noise[1], dtype=x.dtype)
        llr = demapper([y, tc.tensor(no)]).numpy()
        pts = const.points.numpy() if hasattr(const.points, "numpy") \
            else np.asarray(const.points)
        map_fix[f"qam{m}_points"] = pts
        map_fix[f"qam{m}_bits"] = bits
        map_fix[f"qam{m}_x"] = np.asarray(x.numpy())
        map_fix[f"qam{m}_y"] = np.asarray(y.numpy())
        map_fix[f"qam{m}_no"] = np.float32(no)
        map_fix[f"qam{m}_llr"] = llr
    np.savez_compressed(os.path.join(OUT, "mapping.npz"), **map_fix)
    print("wrote mapping.npz")

    # ------------------------------------------------------------------
    # 5) 5G rate-matched encoder + decoder parity
    # ------------------------------------------------------------------
    from my_sn.fec.polar.enc import Polar5GEncoder as RefEnc5G
    from my_sn.fec.polar.dec import Polar5GDecoder as RefDec5G
    g5_fix = {}
    # (k, n): repetition (n > n_polar), puncturing (low rate), shortening
    cases = [(32, 140), (20, 90), (40, 100), (12, 48), (64, 200)]
    for (k, n) in cases:
        enc = RefEnc5G(k=k, n=n)
        bits = rng.integers(0, 2, size=(8, k)).astype(np.float32)
        cw = enc(tc.tensor(bits)).numpy()
        g5_fix[f"ul_k{k}_n{n}_bits"] = bits
        g5_fix[f"ul_k{k}_n{n}_cw"] = cw
        g5_fix[f"ul_k{k}_n{n}_frozen"] = np.asarray(enc._frozen_pos
                                                    if hasattr(enc, "_frozen_pos")
                                                    else enc.frozen_pos)
        # noisy LLRs -> reference SCL-8 decode
        llr = (2.0 * cw - 1.0) * 2.0 + rng.normal(
            0.0, 1.0, size=cw.shape).astype(np.float32)
        llr = llr.astype(np.float32)
        dec = RefDec5G(enc, dec_type="SCL", list_size=8)
        u_hat = dec(tc.tensor(llr)).numpy()
        g5_fix[f"ul_k{k}_n{n}_llr"] = llr
        g5_fix[f"ul_k{k}_n{n}_uhat_scl8"] = u_hat
    np.savez_compressed(os.path.join(OUT, "polar5g.npz"), **g5_fix)
    print("wrote polar5g.npz")

    # ------------------------------------------------------------------
    # 6) OSD parity
    # ------------------------------------------------------------------
    from my_sn.fec.osd.dec import OSDecoder as RefOSD
    from my_sn.fec.polar.enc import PolarEncoder as RefPolarEnc
    osd_fix = {}
    k, n = 16, 32
    fp, ip = ref_5g_ranking(k, n)
    renc = RefPolarEnc(np.asarray(fp), n)
    for t in (0, 1, 2):
        osd = RefOSD(encoder=renc, t=t)
        llr = rng.normal(0.0, 3.0, size=(16, n)).astype(np.float32)
        c_hat = osd(tc.tensor(llr)).numpy()
        osd_fix[f"t{t}_llr"] = llr
        osd_fix[f"t{t}_chat"] = c_hat
    osd_fix["frozen_pos"] = np.asarray(fp)
    np.savez_compressed(os.path.join(OUT, "osd.npz"), **osd_fix)
    print("wrote osd.npz")


if __name__ == "__main__":
    main()
