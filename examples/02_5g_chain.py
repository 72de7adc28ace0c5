"""TS 38.212 5G NR polar chain: CRC attach, rate matching, CA-SCL decode.

Covers the reference's `Polar5GEncoder`/`Polar5GDecoder` surface
(`my_sn/fec/polar/enc.py`/`dec.py`) plus the working hybSCL serving path.

    python examples/02_5g_chain.py
"""

import os
import sys

# runnable without installation: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import polar_tpu as pt


def main():
    k, n = 400, 1000  # any n, not just powers of two (rate matching)
    enc = pt.Polar5GEncoder(k=k, n=n)  # uplink: CRC11 + subblock interleave
    dec = pt.Polar5GDecoder(enc, dec_type="SCL", list_size=8,
                            return_crc_status=True)

    key = jax.random.PRNGKey(0)
    ku, kc = jax.random.split(key)
    u = pt.binary_source(ku, (64, k))
    c = enc(u)

    # QPSK over AWGN at 3 dB, exact demap
    no = pt.ebnodb2no(3.0, n_bits_per_sym=2, coderate=k / n)
    constell = pt.Constellation(2)
    x = pt.Mapper(constell)(c)
    y = pt.AWGN()(kc, (x, no))
    llr = pt.Demapper(constell)((y, no))

    u_hat, crc_ok = dec(llr)
    ber = jnp.mean(u != u_hat)
    print(f"BER {float(ber):.5f}; CRC pass rate "
          f"{float(jnp.mean(crc_ok)):.3f}")

    # hybSCL: SC-first, CA-SCL re-decode of CRC failures only — much
    # higher throughput at the same BLER (see benchmarks/throughput.json)
    dec_hyb = pt.Polar5GDecoder(enc, dec_type="hybSCL", list_size=8)
    u_hyb = dec_hyb(llr)
    print(f"hybSCL BER {float(jnp.mean(u != u_hyb)):.5f}")


if __name__ == "__main__":
    main()
