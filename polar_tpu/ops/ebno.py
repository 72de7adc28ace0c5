"""Eb/N0 (dB) to noise-variance conversion (reference ``my_sn/trans/ebno.py``)."""

import jax.numpy as jnp


def ebnodb2no(ebno_db, n_bits_per_sym, coderate):
    """``No = 1 / (10^(EbNo/10) * coderate * bits_per_symbol)`` (Es = 1)."""
    ebno = 10.0 ** (jnp.asarray(ebno_db, dtype=jnp.float32) / 10.0)
    energy_per_symbol = 1.0
    return 1.0 / (ebno * coderate * n_bits_per_sym / energy_per_symbol)
