"""Uncoded baseline (reference ``my_sn/fec/no_code/enc_dec.py``)."""

import jax.numpy as jnp


class NoEncoder:
    """Identity encoder."""

    def __call__(self, bits):
        return bits


class NoDecoder:
    """Hard decision on logits: ``llr > 0 -> 1``."""

    def __call__(self, llr):
        return jnp.where(llr > 0, 1.0, 0.0)
