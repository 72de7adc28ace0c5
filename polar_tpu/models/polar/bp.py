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
                 use_pallas=None, output_dtype=jnp.float32,
                 two_pass: bool = False, first_pass_iters: int = 8,
                 min_capacity: int = 128, msg_dtype=jnp.float32):
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
        # message-lattice dtype. The XLA engine is HBM-bound (streams
        # ~3 [n, bs] arrays per stage update — docs/PERFORMANCE.md "BP
        # roofline"), so bf16 messages halve the traffic that binds it.
        # llr_max=30 and msf=15/16 are exactly representable in bf16; only
        # the f/g arithmetic rounds. Opt-in (default f32 keeps the
        # fixture/engine bit-identity contracts); BLER delta is within MC
        # noise at n=1024 (tests/test_bp.py, benchmarks/throughput.json
        # bp20_n1024_bf16). Ignored by the fused Pallas kernel (the axon
        # compile service cannot lower bf16 vector ops — PERFORMANCE.md
        # service limits), which keeps f32 and auto-disables here.
        self.msg_dtype = jnp.dtype(msg_dtype)
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
        # two-pass serving path (throughput lever at operating SNR): a
        # cheap first pass of ``first_pass_iters`` sweeps accepts the
        # converged blocks (G-matrix criterion, identical to the in-decode
        # early stop), and only the failures re-decode at the full
        # ``num_iter`` budget in compacted capacity buckets. BP has no
        # cross-lane coupling and the full-budget re-decode replays the
        # same sweep/freeze trajectory, so outputs are BIT-IDENTICAL to
        # the single-pass decoder (tests/test_bp.py).
        self.two_pass = bool(two_pass)
        self.requires_host = self.two_pass
        self.first_pass_iters = min(int(first_pass_iters), self.num_iter)
        self.min_capacity = int(min_capacity)
        self._cap_hwm = self.min_capacity
        if self.two_pass:
            assert self.early_stop, "two_pass needs early_stop"
            self._jit_pass1 = jax.jit(lambda x: self._run(
                x, self.first_pass_iters, want_done=True))
            self._jit_cache = {}

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
        return self._run(llr_logits, self.num_iter, want_done=False)[0]

    def _run(self, llr_logits, num_iter, want_done=False):
        """Decode at a given sweep budget; ``want_done=True`` additionally
        returns the G-matrix convergence flag [bs] (needs early_stop) —
        the accept test of the two-pass serving path."""
        assert not want_done or self.early_stop
        bs = llr_logits.shape[0]
        n, S = self.n, self._S
        f = self._f
        llr_ch = -llr_logits.astype(jnp.float32).T  # [n, bs] true LLRs

        use_pallas = self._use_pallas
        if use_pallas is None:
            import os
            # r4: the axon remote compile helper currently fails on the
            # whole-decode BP kernel's program size (HTTP 500 on every
            # n>=256 full-sweep body — benchmarks/probe_r4.py coldbp*;
            # the r3 rows rode a warm executable cache). Auto therefore
            # keeps the XLA engine; POLAR_TPU_BP_KERNEL=1 re-enables the
            # kernel for backends whose compiler handles it.
            use_pallas = (jax.default_backend() not in ("cpu",)
                          and bs % 128 == 0
                          and self.msg_dtype == jnp.float32
                          and os.environ.get("POLAR_TPU_BP_KERNEL") == "1")
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
            assert self.msg_dtype == jnp.float32, \
                "the fused BP kernel is f32-only (bf16 vector ops do not " \
                "lower on the axon compile service)"
            from polar_tpu.models.polar.pallas_bp import bp_pallas
            res = bp_pallas(
                llr_ch, jnp.asarray(self._prior), S=S,
                num_iter=num_iter, check_every=self.check_every,
                early_stop=self.early_stop, mode=self.mode, msf=self.msf,
                llr_max=self.llr_max,
                interpret=jax.default_backend() == "cpu",
                return_done=want_done)
            if want_done:
                return self._finish(res[0]), res[1] > 0
            return self._finish(res), None

        dt = self.msg_dtype
        prior = jnp.broadcast_to(
            jnp.asarray(self._prior, dtype=dt)[:, None], (n, bs))

        # message lattice: lmsg/rmsg [S+1, n, bs] in msg_dtype
        lmsg = jnp.zeros((S + 1, n, bs), dt).at[S].set(llr_ch.astype(dt))
        rmsg = jnp.zeros((S + 1, n, bs), dt).at[0].set(prior)

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

        done = None
        if self.early_stop:
            # full check_every-sized chunks only; a static remainder chunk
            # below keeps the total at EXACTLY num_iter sweeps (matching
            # early_stop=False when num_iter % check_every != 0)
            full = (num_iter // self.check_every) * self.check_every

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
            for _ in range(num_iter - full):
                l_new, r_new = sweep(lmsg, rmsg)
                keep = done[None, None, :]
                lmsg = jnp.where(keep, lmsg, l_new)
                rmsg = jnp.where(keep, rmsg, r_new)
        else:
            def one_iter(_, msgs):
                return sweep(*msgs)

            lmsg, rmsg = lax.fori_loop(0, num_iter, one_iter,
                                       (lmsg, rmsg))
        return self._finish(lmsg[0] + rmsg[0]), done

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
        llr2d = inputs.reshape(-1, self.n)
        if self.two_pass:
            out = self.decode_pipelined([llr2d])[0]
        else:
            out = self._jit_decode(llr2d)
        return out.reshape(lead + (self.k,))

    def decode(self, llr_logits):
        return self._decode_2d(llr_logits)

    # ------------------------------------------------------------------
    # two-pass serving path (see __init__ note; mirrors HybridSCLDecoder's
    # pipelined compaction machinery, hybrid.py)
    # ------------------------------------------------------------------
    def _capacity(self, n_fail: int, bucket: int) -> int:
        cap = self.min_capacity
        while cap < n_fail:
            cap *= 2
        cap = max(cap, self._cap_hwm)
        cap = min(cap, bucket)
        self._cap_hwm = max(self._cap_hwm, cap)
        return cap

    def prewarm(self, bs: int, scl_capacity: int = None):
        """Compile the pass-1 program (at ``bs``) and the pass-2 ROWS
        program decode_pipelined actually executes (concat + gather +
        full-budget ``_run`` traced inline; arity 1 covers the __call__
        path) at the re-decode bucket capacity. ADVICE r4: prewarming a
        plain full-budget ``_run`` left the serving path cold-compiling
        on its first real batch."""
        if scl_capacity:
            self._cap_hwm = max(self._cap_hwm, int(scl_capacity))
        _, done = self._jit_pass1(jnp.zeros((bs, self.n), jnp.float32))
        np.asarray(done)
        np.asarray(self._jitted_pass2_rows(1, self._cap_hwm)(
            jnp.zeros(self._cap_hwm, jnp.int32),
            jnp.zeros((bs, self.n), jnp.float32)))

    def decode_pipelined(self, llr_batches, scl_batch: int = 8192):
        """Decode many ``[bs_i, n]`` batches with ONE convergence-mask
        sync and cross-batch full-budget re-decodes of the failures
        (compacted into ``scl_batch``-sized buckets). Bit-identical to
        per-batch ``_decode_2d``."""
        assert self.two_pass
        llr_batches = [jnp.reshape(x, (-1, self.n)) for x in llr_batches]
        sizes = tuple(int(x.shape[0]) for x in llr_batches)
        p1 = [self._jit_pass1(x) for x in llr_batches]
        done_np = np.asarray(self._jitted_concat(len(p1))(
            *[d for _, d in p1]))
        fail = np.nonzero(~done_np)[0]

        chunks = []
        for lo in range(0, int(fail.size), scl_batch):
            chunk = fail[lo:lo + scl_batch]
            cap = self._capacity(int(chunk.size), scl_batch)
            idx = np.full(cap, chunk[0], dtype=np.int32)
            idx[:chunk.size] = chunk
            chunks.append((jnp.asarray(idx), int(chunk.size)))
        p2 = [self._jitted_pass2_rows(len(llr_batches),
                                      int(idx.shape[0]))(idx, *llr_batches)
              for idx, _ in chunks]
        return list(self._jitted_finalize(
            sizes, tuple(c[1] for c in chunks))(
                [u for u, _ in p1], [c[0] for c in chunks], p2))

    def _jitted_concat(self, arity):
        key = ("concat", arity)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                lambda *xs: jnp.concatenate(xs, axis=0))
        return self._jit_cache[key]

    def _jitted_pass2_rows(self, arity, cap):
        key = ("pass2", arity, cap)
        if key not in self._jit_cache:
            def f(idx, *llrs):
                sub = jnp.take(jnp.concatenate(llrs, axis=0), idx, axis=0)
                return self._run(sub, self.num_iter, want_done=False)[0]
            self._jit_cache[key] = jax.jit(f)
        return self._jit_cache[key]

    def _jitted_finalize(self, sizes, chunk_sizes):
        key = ("finalize", sizes, chunk_sizes)
        if key not in self._jit_cache:
            def f(u_p1, idxs, p2_outs):
                u_all = jnp.concatenate(u_p1, axis=0)
                for idx, u2, m in zip(idxs, p2_outs, chunk_sizes):
                    u_all = u_all.at[idx[:m]].set(u2[:m])
                outs, off = [], 0
                for bs_i in sizes:
                    outs.append(u_all[off:off + bs_i])
                    off += bs_i
                return tuple(outs)
            self._jit_cache[key] = jax.jit(f)
        return self._jit_cache[key]
