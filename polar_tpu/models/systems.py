"""End-to-end link-level system models (source -> enc -> map -> channel ->
demap -> dec), parity with reference ``x_run_sn_polar/z_sys_model/``.

Functional design: a system model exposes ``step(key, ebno_db)`` — a pure
function of the PRNG key and the (traced) SNR point — so the *entire* chain,
decoder included, compiles to one XLA program per batch size. ``__call__``
keeps the reference's ``(batch_size, ebno_db)`` ergonomics with an explicit
key argument.
"""

from functools import partial

import jax
import jax.numpy as jnp

from polar_tpu.ops import ebno as ebno_mod
from polar_tpu.ops.source import binary_source
from polar_tpu.ops.mapping import Constellation, Mapper, Demapper
from polar_tpu.ops.channels import AWGN, BinaryErasureChannel


def _decode_fn(decoder):
    if getattr(decoder, "requires_host", False):
        return decoder  # __call__ orchestrates its own jitted programs
    return decoder.decode if hasattr(decoder, "decode") else decoder


class SystemAWGNModel:
    """QPSK over AWGN with exact demapping (reference ``awgn_model.py:16-44``;
    ``n_bits_per_sym=2`` is hardcoded there too)."""

    def __init__(self, n: int, k: int, encoder, decoder,
                 cw_estimates: bool = False, n_bits_per_sym: int = 2):
        self.cw_estimates = cw_estimates
        self.n_bits_per_sym = n_bits_per_sym
        self.n = n
        self.k = k
        self.coderate = k / n
        self.constell = Constellation(n_bits_per_sym)
        self.mapper = Mapper(self.constell)
        self.demapper = Demapper(self.constell)
        self.awgn_channel = AWGN()
        self.encoder = encoder
        self.decoder = decoder
        self._decode = _decode_fn(decoder)
        # host-orchestrated decoders (e.g. HybridSCLDecoder) cannot be
        # traced into the chain program; jit the front half around them
        self.requires_host = getattr(decoder, "requires_host", False)
        self._jit_steps = {}
        self._jit_fronts = {}

    def front(self, key, batch_size: int, ebno_db):
        """Pure front half: source -> encode -> map -> AWGN -> demap.
        Returns ``(bits, codewords, llr)``."""
        no = ebno_mod.ebnodb2no(ebno_db, self.n_bits_per_sym, self.coderate)
        k_bits, k_chan = jax.random.split(key)
        bits = binary_source(k_bits, (batch_size, self.k))
        codewords = self.encoder(bits)
        x = self.mapper(codewords)
        y = self.awgn_channel(k_chan, (x, no))
        llr = self.demapper((y, no))
        return bits, codewords, llr

    def step(self, key, batch_size: int, ebno_db):
        """Pure function: one Monte-Carlo batch at ``ebno_db``.
        Returns ``(bits, bits_hat)`` (or ``(codewords, bits_hat)``)."""
        bits, codewords, llr = self.front(key, batch_size, ebno_db)
        bits_hat = self._decode(llr)
        if self.cw_estimates:
            return codewords, bits_hat
        return bits, bits_hat

    def __call__(self, key, batch_size: int, ebno_db):
        if self.requires_host:
            if batch_size not in self._jit_fronts:
                self._jit_fronts[batch_size] = jax.jit(
                    partial(self.front, batch_size=batch_size))
            bits, codewords, llr = self._jit_fronts[batch_size](
                key, ebno_db=ebno_db)
            bits_hat = self._decode(llr)
            return (codewords, bits_hat) if self.cw_estimates \
                else (bits, bits_hat)
        if batch_size not in self._jit_steps:
            self._jit_steps[batch_size] = jax.jit(
                partial(self.step, batch_size=batch_size))
        return self._jit_steps[batch_size](key, ebno_db=ebno_db)


class SystemBECModel:
    """Binary erasure channel link (reference ``bec_model.py``): the SNR
    argument is reinterpreted as the erasure probability ``pe``."""

    def __init__(self, n: int, k: int, encoder, decoder,
                 cw_estimates: bool = False):
        self.cw_estimates = cw_estimates
        self.n = n
        self.k = k
        self.coderate = k / n
        self.channel = BinaryErasureChannel(return_llrs=True)
        self.encoder = encoder
        self.decoder = decoder
        self._decode = _decode_fn(decoder)
        self.requires_host = getattr(decoder, "requires_host", False)
        self._jit_steps = {}
        self._jit_fronts = {}

    def front(self, key, batch_size: int, ebno_db):
        k_bits, k_chan = jax.random.split(key)
        bits = binary_source(k_bits, (batch_size, self.k))
        codewords = self.encoder(bits)
        llr = self.channel(k_chan, (codewords, ebno_db))
        return bits, codewords, llr

    def step(self, key, batch_size: int, ebno_db):
        bits, codewords, llr = self.front(key, batch_size, ebno_db)
        bits_hat = self._decode(llr)
        if self.cw_estimates:
            return codewords, bits_hat
        return bits, bits_hat

    def __call__(self, key, batch_size: int, ebno_db):
        if self.requires_host:
            if batch_size not in self._jit_fronts:
                self._jit_fronts[batch_size] = jax.jit(
                    partial(self.front, batch_size=batch_size))
            bits, codewords, llr = self._jit_fronts[batch_size](
                key, ebno_db=ebno_db)
            bits_hat = self._decode(llr)
            return (codewords, bits_hat) if self.cw_estimates \
                else (bits, bits_hat)
        if batch_size not in self._jit_steps:
            self._jit_steps[batch_size] = jax.jit(
                partial(self.step, batch_size=batch_size))
        return self._jit_steps[batch_size](key, ebno_db=ebno_db)
