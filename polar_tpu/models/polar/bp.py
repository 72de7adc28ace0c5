"""Iterative belief-propagation (BP) polar decoder.

The reference's decoder module advertises "SC, SCL and iterative BP
decoding" (``my_sn/fec/polar/dec.py:1``) but ships no BP implementation;
this completes the family (Sionna's ``PolarBPDecoder``, Arikan's BP over
the encoding factor graph). BP is the most TPU-friendly polar decoder:
every iteration is a dense, fully-parallel sweep of butterfly
processing-element updates over the whole ``[n, S+1]`` message lattice —
no sequential per-bit dependency at all — so it runs as ``2S`` fused
vector ops per iteration inside one ``lax.fori_loop``.

Message layout: ``lmsg[s] / rmsg[s]``, ``s = 0..S``, are the
right-to-left / left-to-right LLR messages at the stage-``s`` boundary
(``s = S`` is the channel side, ``s = 0`` the info side). The stage-``s``
processing element couples, inside every block of ``2^{s+1}`` positions,
the upper half (the XOR branch of the encoder butterfly,
``ops/butterfly.py``) with the lower half:

    l_s[u] = f(l_{s+1}[u], l_{s+1}[v] + r_s[v])
    l_s[v] = f(l_{s+1}[u], r_s[u]) + l_{s+1}[v]
    r_{s+1}[u] = f(r_s[u], l_{s+1}[v] + r_s[v])
    r_{s+1}[v] = f(r_s[u], l_{s+1}[u]) + r_s[v]

with ``f`` the boxplus (exact or min-sum, ``ops/fg.py``). Frozen positions
carry a ``+llr_max`` prior on the info side. BP is suboptimal vs SCL but
iteration-parallel; it also supports soft output.

Convergence hardening (both measured at n=1024, k=512, 2 dB):

* **Scaled min-sum** (``msf``, default 0.9375): raw min-sum BP diverges at
  large blocklengths (BER 0.23 vs SC's 0.015 at 20 iterations); the
  normalized form lands in the SC class (0.026 @ 20 it, 0.007 @ 50 it).
* **G-matrix early stopping** (``early_stop``, default True): after every
  iteration each block re-encodes its info-side hard decision û and
  compares against the channel-side hard decision x̂; a block with
  ``G·û == x̂`` freezes its message lattice (no further updates — BP can
  oscillate *out* of a codeword), and the iteration loop exits as soon as
  every block in the batch has converged (Yuan & Parhi's detection
  criterion). At operating SNR most blocks converge in far fewer than
  ``num_iter`` sweeps, so this is also the main BP throughput lever.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from polar_tpu.ops.fg import F_FUNCTIONS, make_scaled_minsum
from polar_tpu.models.polar.construction import info_positions


class PolarBPDecoder:
    """BP decoder. ``__call__(llr_logits[..., n]) -> u_hat[..., k]``
    (hard decisions; ``hard_out=False`` returns info-side soft logits)."""

    def __init__(self, frozen_pos, n: int, num_iter: int = 20,
                 mode: str = "minsum", hard_out: bool = True,
                 llr_max: float = 30.0, msf: float = 0.9375,
                 early_stop: bool = True, check_every: int = 2,
                 use_pallas=None, output_dtype=jnp.float32):
        n = int(n)
        assert np.log2(n) == int(np.log2(n)), "n must be a power of 2."
        assert num_iter >= 1
        self.n = n
        self._S = int(np.log2(n))
        self.frozen_pos = np.asarray(frozen_pos, dtype=np.int64)
        self.k = n - len(self.frozen_pos)
        self.info_pos = info_positions(self.frozen_pos, n)
        self.num_iter = int(num_iter)
        self.hard_out = bool(hard_out)
        self.llr_max = float(llr_max)
        self.early_stop = bool(early_stop)
        # run this many sweeps between convergence checks: the G-matrix
        # re-encode adds ~15% element-ops per sweep, so checking every
        # sweep taxes the worst-case (non-converging) blocks the most
        self.check_every = max(1, int(check_every))
        self.output_dtype = output_dtype
        assert mode in F_FUNCTIONS, f"unknown mode {mode!r}"
        self.mode = mode
        self.msf = float(msf)
        if mode in ("minsum", "max") and self.msf != 1.0:
            self._f = make_scaled_minsum(self.msf)
        else:
            self._f = F_FUNCTIONS[mode]
        prior = np.zeros(n, dtype=np.float32)
        prior[self.frozen_pos] = self.llr_max  # true-LLR: positive -> bit 0
        self._prior = prior
        frozen_mask = np.zeros(n, dtype=bool)
        frozen_mask[self.frozen_pos] = True
        self._frozen_mask = frozen_mask
        # fused whole-decode Pallas kernel (pallas_bp.py): the message
        # lattice stays VMEM-resident across ALL sweeps instead of riding
        # HBM 2S times per sweep. None = auto (TPU, lane-aligned batch);
        # bit-identical to the XLA engine (tests/test_bp.py).
        self._use_pallas = use_pallas
        self._jit_decode = jax.jit(self._decode_2d)

    def _pairs(self, x, s):
        """[n, bs] -> (upper, lower) halves of the stage-s butterflies."""
        n, bs = x.shape
        span = 1 << s
        blk = x.reshape(n // (2 * span), 2, span, bs)
        return blk[:, 0], blk[:, 1]

    def _unpairs(self, u, v):
        blocks, span, bs = u.shape
        return jnp.stack([u, v], axis=1).reshape(blocks * 2 * span, bs)

    def _decode_2d(self, llr_logits):
        bs = llr_logits.shape[0]
        n, S = self.n, self._S
        f = self._f
        llr_ch = -llr_logits.astype(jnp.float32).T  # [n, bs] true LLRs

        use_pallas = self._use_pallas
        if use_pallas is None:
            use_pallas = (jax.default_backend() not in ("cpu",)
                          and bs % 128 == 0)
            if use_pallas:
                # auto mode only engages the fused kernel when its whole
                # message lattice fits scoped VMEM at SOME legal batch
                # tile (n >= 2048 does not at the default 16 MiB limit) —
                # otherwise fall back to the XLA engine instead of raising
                from polar_tpu.models.polar.pallas_bp import bp_vmem_bytes
                from polar_tpu.models.polar.pallas_scl import (
                    fit_tile, _vmem_limit_override)
                try:
                    fit_tile(bs, lambda t: bp_vmem_bytes(n, S, t),
                             vmem_limit=_vmem_limit_override())
                except ValueError:
                    use_pallas = False
        if use_pallas:
            from polar_tpu.models.polar.pallas_bp import bp_pallas
            u_llr = bp_pallas(
                llr_ch, jnp.asarray(self._prior), S=S,
                num_iter=self.num_iter, check_every=self.check_every,
                early_stop=self.early_stop, mode=self.mode, msf=self.msf,
                llr_max=self.llr_max,
                interpret=jax.default_backend() == "cpu")
            return self._finish(u_llr)

        prior = jnp.broadcast_to(jnp.asarray(self._prior)[:, None], (n, bs))

        # message lattice: lmsg/rmsg [S+1, n, bs]
        lmsg = jnp.zeros((S + 1, n, bs), jnp.float32).at[S].set(llr_ch)
        rmsg = jnp.zeros((S + 1, n, bs), jnp.float32).at[0].set(prior)

        def pe(l_next, r_cur, s):
            lu, lv = self._pairs(l_next, s)
            ru, rv = self._pairs(r_cur, s)
            l_u = f(lu, lv + rv, self.llr_max)
            l_v = f(lu, ru, self.llr_max) + lv
            r_u = f(ru, lv + rv, self.llr_max)
            r_v = f(ru, lu, self.llr_max) + rv
            return (self._unpairs(l_u, l_v), self._unpairs(r_u, r_v))

        def sweep(lmsg, rmsg):
            # right-to-left sweep: update l at stages S-1 .. 0
            for s in range(S - 1, -1, -1):
                l_new, _ = pe(lmsg[s + 1], rmsg[s], s)
                lmsg = lmsg.at[s].set(l_new)
            # left-to-right sweep: update r at stages 1 .. S
            for s in range(0, S):
                _, r_new = pe(lmsg[s + 1], rmsg[s], s)
                rmsg = rmsg.at[s + 1].set(r_new)
            return lmsg, rmsg

        def encode_hard(u_bits):
            # butterfly G·u on [n, bs] int32 (same stages as encode.py)
            c = u_bits
            for s in range(S):
                u_half, v_half = self._pairs(c, s)
                c = self._unpairs(u_half ^ v_half, v_half)
            return c

        frozen_col = jnp.asarray(self._frozen_mask)[:, None]

        def converged(lmsg, rmsg):
            # G-matrix detection: re-encode û, compare to channel-side x̂.
            u_hat = jnp.where(frozen_col,
                              0, (lmsg[0] + rmsg[0] <= 0)).astype(jnp.int32)
            x_hat = (lmsg[S] + rmsg[S] <= 0).astype(jnp.int32)
            return jnp.all(encode_hard(u_hat) == x_hat, axis=0)  # [bs]

        if self.early_stop:
            # full check_every-sized chunks only; a static remainder chunk
            # below keeps the total at EXACTLY num_iter sweeps (matching
            # early_stop=False when num_iter % check_every != 0)
            full = (self.num_iter // self.check_every) * self.check_every

            def cond(carry):
                i, _, _, done = carry
                return jnp.logical_and(i < full,
                                       jnp.logical_not(jnp.all(done)))

            def body(carry):
                i, lmsg, rmsg, done = carry
                l_new, r_new = lmsg, rmsg
                for _ in range(self.check_every):
                    l_new, r_new = sweep(l_new, r_new)
                # freeze converged blocks — BP can oscillate out of a codeword
                keep = done[None, None, :]
                lmsg = jnp.where(keep, lmsg, l_new)
                rmsg = jnp.where(keep, rmsg, r_new)
                return (i + self.check_every, lmsg, rmsg,
                        jnp.logical_or(done, converged(lmsg, rmsg)))

            carry = (jnp.int32(0), lmsg, rmsg, jnp.zeros(bs, bool))
            _, lmsg, rmsg, done = lax.while_loop(cond, body, carry)
            for _ in range(self.num_iter - full):
                l_new, r_new = sweep(lmsg, rmsg)
                keep = done[None, None, :]
                lmsg = jnp.where(keep, lmsg, l_new)
                rmsg = jnp.where(keep, rmsg, r_new)
        else:
            def one_iter(_, msgs):
                return sweep(*msgs)

            lmsg, rmsg = lax.fori_loop(0, self.num_iter, one_iter,
                                       (lmsg, rmsg))
        return self._finish(lmsg[0] + rmsg[0])

    def _finish(self, u_llr):
        """info-side total LLR [n, bs] -> decoder output [bs, k]."""
        u_info = jnp.take(u_llr, self.info_pos, axis=0)  # [k, bs]
        if self.hard_out:
            out = (u_info <= 0).astype(self.output_dtype)
        else:
            out = (-u_info).astype(self.output_dtype)  # back to logits
        return out.T

    def __call__(self, inputs):
        assert inputs.shape[-1] == self.n, "last dim must be of length n"
        assert inputs.ndim > 1
        lead = inputs.shape[:-1]
        out = self._jit_decode(inputs.reshape(-1, self.n))
        return out.reshape(lead + (self.k,))

    def decode(self, llr_logits):
        return self._decode_2d(llr_logits)
