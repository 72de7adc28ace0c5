"""Ordered-statistics decoding of an arbitrary linear code.

OSD approaches ML performance for any (n, k) generator matrix — here a
polar code, but any binary G works (the reference's `my_sn/fec/osd`).

    python examples/04_osd_any_linear_code.py
"""

import os
import sys

# runnable without installation: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import polar_tpu as pt


def main():
    k, n = 32, 64
    frozen, _ = pt.generate_5g_ranking(k, n)
    enc = pt.PolarEncoder(frozen, n)
    osd = pt.OSDecoder(t=2, encoder=enc)          # order-2 reprocessing
    scl = pt.PolarSCLDecoder(frozen, n, list_size=8)

    key = jax.random.PRNGKey(1)
    ku, kc = jax.random.split(key)
    u = pt.binary_source(ku, (256, k))
    c = enc(u)
    no = pt.ebnodb2no(2.0, 2, k / n)
    constell = pt.Constellation(2)
    y = pt.AWGN()(kc, (pt.Mapper(constell)(c), no))
    llr = pt.Demapper(constell)((y, no))

    c_osd = osd(llr)                              # codeword estimate
    u_scl = scl(llr)
    print(f"OSD-2 codeword BER {float(jnp.mean(c != c_osd)):.5f}  "
          f"(SCL-8 info BER {float(jnp.mean(u != u_scl)):.5f})")


if __name__ == "__main__":
    main()
