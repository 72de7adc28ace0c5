"""Successive-cancellation list (SCL) polar decoder, TPU-native.

Algorithmically equivalent to the reference SCL
(``x_run_sn_polar/polar/polar_scl.py``, ``my_sn/fec/polar/dec.py:158-537``):
LLR-based path metrics (Stimming Eq. 10), best-L survivor selection per info
bit, optional fast-SCL rate-0/repetition tree pruning (Hashemi Eq. 26/31)
and CRC-aided final selection. The *implementation* is a from-scratch
TPU design — none of the reference's pointer/in-place-sort machinery
survives functional arrays, and none of it is needed:

* the decode tree is **unrolled at trace time** into one XLA program
  (static schedule, fixed shapes, zero host dispatch);
* workspaces are **O(n) per path**, not O(n log n): one active LLR segment
  per stage (``lbuf``, offsets ``2^s - 1``) plus one persisted left-child
  partial-sum slot per stage (``ubuf0``). Right-child partial sums are
  passed functionally on the unwind and never stored;
* the reference's per-bit ``argsort`` + full-workspace path copy
  (``polar_scl.py:86-120``) becomes ``lax.top_k`` over 2L candidates plus
  **liveness-pruned gathers**: at a fork after leaf ``i``, stage ``s`` of
  ``lbuf`` is re-permuted only if ``bit_{s-1}(i) == 0`` (its g-read is still
  pending) and stage ``s`` of ``ubuf0`` only if ``bit_s(i) == 1`` (its
  combine is still pending) — dead segments are provably never read before
  being rewritten, so most of the path-copy traffic disappears;
* layout is batch-minor ``[seg, L, bs]`` so VPU lanes ride the Monte-Carlo
  batch and sublanes ride the list dimension;
* info bits are recovered from the final per-path codeword by a second
  polar transform (the transform is an involution over GF(2)), so no
  decision history needs to be carried through forks.

Path-metric semantics match the reference exactly (same clipped softplus
updates, same ``pm = [0, llr_max, ...]`` initialization), so survivor sets
are identical up to PM ties.
"""

import numpy as np
import jax
import jax.numpy as jnp

from polar_tpu.ops.fg import F_FUNCTIONS, g as g_op
from polar_tpu.ops.butterfly import polar_transform
from polar_tpu.ops.crc import CRCEncoder, CRCDecoder, crc_polynomial
from polar_tpu.models.polar.construction import info_positions
from polar_tpu.models.polar.scan_core import resolve_spc_min_stage


def _softplus(x):
    return jnp.logaddexp(0.0, x)


class PolarSCLDecoder:
    """SCL decoder. ``__call__(llr_logits[..., n]) -> u_hat[..., k]``
    (plus ``crc_status[...]`` if ``return_crc_status``)."""

    def __init__(self, frozen_pos, n: int, list_size: int = 8,
                 crc_degree=None, use_hybrid_sc: bool = False,
                 use_fast_scl=None, return_crc_status: bool = False,
                 mode: str = "minsum", llr_max: float = 30.0,
                 ind_iil_inv=None, schedule: str = "auto",
                 pc_pos=None, output_dtype=jnp.float32,
                 fast_rate1=None):
        n = int(n)
        assert len(frozen_pos) <= n
        assert np.log2(n) == int(np.log2(n)), "n must be a power of 2."
        assert np.log2(list_size) == int(np.log2(list_size)), \
            "list_size must be a power of 2."
        assert n >= 2
        # SC-first hybrid decoding (the reference ships the algorithm but
        # force-disables it, my_sn/fec/polar/dec.py:437-470,:498; here it
        # works): delegate to the host-orchestrated HybridSCLDecoder.
        self._hybrid = None
        if use_hybrid_sc:
            from polar_tpu.models.polar.hybrid import HybridSCLDecoder
            self._hybrid = HybridSCLDecoder(
                frozen_pos, n, list_size=list_size, crc_degree=crc_degree,
                mode=mode, llr_max=llr_max, ind_iil_inv=ind_iil_inv,
                schedule=schedule, return_crc_status=return_crc_status,
                pc_pos=pc_pos, use_fast_scl=use_fast_scl,
                output_dtype=output_dtype)
        self.requires_host = use_hybrid_sc
        self.n = n
        self._S = int(np.log2(n))
        self.frozen_pos = np.asarray(frozen_pos, dtype=np.int64)
        self.k = n - len(self.frozen_pos)
        self.info_pos = info_positions(self.frozen_pos, n)
        self.list_size = int(list_size)
        self.llr_max = float(llr_max)
        self.output_dtype = output_dtype
        assert mode in F_FUNCTIONS, f"unknown mode {mode!r}"
        self.mode = mode
        self._f = F_FUNCTIONS[mode]
        self._frozen_mask = np.zeros(n, dtype=bool)
        self._frozen_mask[self.frozen_pos] = True
        self._info_idx = self.info_pos

        # 5G PC bits (TS 38.212 5.3.1.2): per-path length-5 shift register,
        # PC positions decode as dynamically-frozen (value y[0]). Forces the
        # unrolled engine (the register is leaf-sequential) without
        # fast-SCL pruning (prunes skip the register's leaf walk).
        self.pc_pos = (None if pc_pos is None
                       else np.asarray(pc_pos, dtype=np.int64))
        if self.pc_pos is not None:
            self._pc_mask = np.zeros(n, dtype=bool)
            self._pc_mask[self.pc_pos] = True
            assert not (self._pc_mask & self._frozen_mask).any()
            self._info_idx = np.setdiff1d(self.info_pos, self.pc_pos)
            self.k = len(self._info_idx)
            schedule = "unrolled"
            use_fast_scl = False

        if crc_degree is not None:
            self._use_crc = True
            # the decoder's "info" word (length k) is payload + CRC parity
            _, crc_len = crc_polynomial(crc_degree)
            enc = CRCEncoder(crc_degree, k=self.k - crc_len)
            self._crc_decoder = CRCDecoder(enc)
            self.k_crc = enc.crc_length
            assert self.k >= self.k_crc, "k too small for given crc_degree."
        else:
            self._use_crc = False
            self._crc_decoder = None
            self.k_crc = 0
        if (crc_degree is None) and return_crc_status:
            raise ValueError("Returning CRC status requires crc_degree.")
        self.return_crc_status = bool(return_crc_status)
        # downlink: undo the input-bit interleaver before the internal CRC
        # check (the decoder output itself stays in interleaved order for
        # compatibility with SC — same contract as Sionna)
        self._ind_iil_inv = (None if ind_iil_inv is None
                             else np.asarray(ind_iil_inv))

        # program-size/compile-time tradeoff (see scan_core.py docstring):
        # "unrolled" = O(n) XLA ops with fast-SCL pruning + liveness-pruned
        # forks; "scan" = O(log^2 n) ops, lazy path pointers, no pruning.
        from polar_tpu.models.polar.sc import SCAN_THRESHOLD_N
        assert schedule in ("auto", "unrolled", "scan")
        if schedule == "auto":
            schedule = "scan" if n >= SCAN_THRESHOLD_N else "unrolled"
        self.schedule = schedule
        # Fast-SCL pruning (Hashemi rate-0/rep shortcuts, reference default
        # use_fast_scl=True): the unrolled engine prunes in its recursion;
        # the scan engine runs the pruned schedule through
        # scan_core.scl_sweep_hybrid_fast (bit-identical to the unrolled
        # fast path — the outer sweep is then unrolled over schedule
        # units, so the program is O(#pruned-ops) instead of O(log^2 n)).
        # Under min-sum the pruned and plain trees differ numerically, so
        # the default None resolves per-engine to keep each engine's
        # established bit-contract: unrolled -> True (reference default),
        # scan -> False (the O(log^2 n) plain sweep).
        if use_fast_scl is None:
            self.use_fast_scl = schedule == "unrolled"
        else:
            self.use_fast_scl = bool(use_fast_scl)
        # Rate-1 node shortcuts (Hashemi fast-SSCL, beyond the reference's
        # rate-0/rep set): opt-in — default None resolves from the
        # POLAR_TPU_FAST_RATE1 env (bench leader config), else False to
        # keep the established reference-parity fast contract. Only
        # meaningful on the fast path; requires use_fast_scl.
        if fast_rate1 is None:
            import os
            fast_rate1 = os.environ.get("POLAR_TPU_FAST_RATE1", "0") == "1"
        self.fast_rate1 = bool(fast_rate1) and self.use_fast_scl \
            and self.pc_pos is None
        # SPC node formation threshold (shipped OFF — see scan_core's
        # SPC_MIN_STAGE_OFF note: node-top machinery loses to the r/o
        # decomposition on the vector kernels); resolved once so the
        # unrolled recursion and the sweep build the same schedule
        self._spc_min = resolve_spc_min_stage()

        self._jit_decode = jax.jit(self._decode_2d)

    # ------------------------------------------------------------------
    # fork: select best L of 2L candidate paths, re-permute live state
    # ------------------------------------------------------------------
    def _fork(self, state, pmc, last_leaf: int, min_stage: int):
        """pmc: [2L, bs] candidate PMs, candidate j = (bit j//L, parent j%L).
        Returns (state, ubit[L, bs] int8, parent[L, bs] int32) for the
        surviving paths."""
        lbuf, u0, pm, y = state
        L = self.list_size
        neg_vals, idx = jax.lax.top_k(-pmc.T, L)  # [bs, L]
        new_pm = (-neg_vals).T  # [L, bs]
        parent = (idx % L).T.astype(jnp.int32)  # [L, bs]
        ubit = (idx // L).T.astype(jnp.int8)  # [L, bs]

        pidx3 = parent[None, :, :]  # broadcast over the segment axis
        # re-permute live lbuf stages (g-read pending <=> bit_{s-1} == 0)
        for s in range(max(1, min_stage + 1), self._S):
            if ((last_leaf >> (s - 1)) & 1) == 0:
                off, w = (1 << s) - 1, 1 << s
                seg = jax.lax.dynamic_slice_in_dim(lbuf, off, w, axis=0)
                seg = jnp.take_along_axis(seg, pidx3, axis=1)
                lbuf = jax.lax.dynamic_update_slice_in_dim(lbuf, seg, off,
                                                           axis=0)
        # re-permute live ubuf0 stages (combine pending <=> bit_s == 1)
        for s in range(min_stage, self._S):
            if ((last_leaf >> s) & 1) == 1:
                off, w = (1 << s) - 1, 1 << s
                seg = jax.lax.dynamic_slice_in_dim(u0, off, w, axis=0)
                seg = jnp.take_along_axis(seg, pidx3, axis=1)
                u0 = jax.lax.dynamic_update_slice_in_dim(u0, seg, off, axis=0)
        if y is not None:  # PC shift register follows its surviving path
            y = jnp.take_along_axis(y, parent[None, :, :], axis=1)
        return (lbuf, u0, new_pm, y), ubit, parent

    # ------------------------------------------------------------------
    # rate-1 node (fast_rate1): theta sequential least-reliable-flip forks
    # ------------------------------------------------------------------
    def _rate1_node(self, state, a, s: int, lo: int):
        """Decode the all-info node covering [lo, lo + 2^s) at its top.
        ``a``: clipped stage-s LLRs [w, L, bs]. Returns (state,
        c [w, L, bs] int8) — the node codeword for the surviving paths."""
        lbuf, u0, pm, y = state
        L = self.list_size
        w, _, bs = a.shape
        aab = jnp.abs(a)
        pm = pm + jnp.sum(_softplus(-aab), axis=0)     # hard-decision base
        hd = (a < 0).astype(jnp.int8)                  # 0-LLR tie -> bit 0
        theta = min(L - 1, w)
        small = w <= L - 1   # theta == w: every position forks, so the
        # enumeration ORDER is free (sequential fork+prune with a zero-cost
        # "keep" option is exact best-L for any order) — fork in ROW order
        # and skip the reliability sort entirely
        if not small:
            # per-path ascending |LLR| (ties -> lower row index, matching
            # the fused kernel's iterative-min extraction)
            negv, rows = jax.lax.top_k(jnp.moveaxis(-aab, 0, -1), theta)
            vals = -negv                                # [L, bs, theta]
        state = (lbuf, u0, pm, y)
        qn = None            # node-local parent composition [L, bs]
        fm = jnp.zeros((w, L, bs), dtype=jnp.int8)      # flips, current order
        iota_w = jnp.arange(w, dtype=jnp.int32)[:, None, None]
        for t in range(theta):
            val_t = aab[t] if small else vals[:, :, t]
            if qn is not None:
                val_t = jnp.take_along_axis(val_t, qn, axis=0)
            lbuf, u0, pm, y = state
            pmc = jnp.concatenate([pm, pm + val_t], axis=0)
            state, flip, parent = self._fork((lbuf, u0, pm, y), pmc,
                                             last_leaf=lo + w - 1,
                                             min_stage=s)
            qn = (parent if qn is None
                  else jnp.take_along_axis(qn, parent, axis=0))
            fm = jnp.take_along_axis(fm, parent[None], axis=1)
            if small:
                fm = fm ^ jnp.where(iota_w == t, flip[None],
                                    jnp.int8(0))
            else:
                row_t = jnp.take_along_axis(
                    rows[:, :, t].astype(jnp.int32), qn, axis=0)  # [L, bs]
                fm = fm ^ jnp.where(
                    (iota_w == row_t[None]) & (flip[None] == 1),
                    jnp.int8(1), jnp.int8(0))
        c = hd if qn is None else jnp.take_along_axis(hd, qn[None], axis=1)
        return state, c ^ fm

    # ------------------------------------------------------------------
    # SPC node (fast_rate1): parity-tracked least-reliable-flip forks
    # ------------------------------------------------------------------
    def _spc_node(self, state, a, s: int, lo: int):
        """Decode the single-parity-check node (first leaf frozen, rest
        info) covering [lo, lo + 2^s) at its top: codewords are the
        even-parity words. Base PM pays the hard decision plus — when its
        parity is odd — the forced flip of the least reliable position;
        then min(L, w) - 1 sequential forks each offer "flip the t-th
        least reliable position and toggle the least reliable one"
        (penalty |a|_(t) + (1-2e)|a|_(0) with e the per-path toggle
        state) — Hashemi Fast-SSCL-SPC, exact. Returns (state,
        c [w, L, bs] int8)."""
        lbuf, u0, pm, y = state
        L = self.list_size
        w, _, bs = a.shape
        aab = jnp.abs(a)
        hd = (a < 0).astype(jnp.int8)                  # 0-LLR tie -> bit 0
        par = jnp.bitwise_and(jnp.sum(hd.astype(jnp.int32), axis=0), 1)
        theta = min(L, w)
        negv, rows = jax.lax.top_k(jnp.moveaxis(-aab, 0, -1), theta)
        vals = -negv                                    # [L, bs, theta]
        v0 = vals[:, :, 0]
        pm = pm + jnp.sum(_softplus(-aab), axis=0) \
            + par.astype(jnp.float32) * v0
        e = par.astype(jnp.int8)       # toggle state of position (0)
        state = (lbuf, u0, pm, y)
        qn = None
        fm = jnp.zeros((w, L, bs), dtype=jnp.int8)
        iota_w = jnp.arange(w, dtype=jnp.int32)[:, None, None]
        for t in range(1, theta):
            val_t = vals[:, :, t]
            v0c = v0
            if qn is not None:
                val_t = jnp.take_along_axis(val_t, qn, axis=0)
                v0c = jnp.take_along_axis(v0, qn, axis=0)
            pen = val_t + (1.0 - 2.0 * e.astype(jnp.float32)) * v0c
            lbuf, u0, pm, y = state
            pmc = jnp.concatenate([pm, pm + pen], axis=0)
            state, flip, parent = self._fork((lbuf, u0, pm, y), pmc,
                                             last_leaf=lo + w - 1,
                                             min_stage=s)
            qn = (parent if qn is None
                  else jnp.take_along_axis(qn, parent, axis=0))
            fm = jnp.take_along_axis(fm, parent[None], axis=1)
            e = jnp.take_along_axis(e, parent, axis=0) ^ flip
            row_t = jnp.take_along_axis(rows[:, :, t].astype(jnp.int32),
                                        qn, axis=0)
            fm = fm ^ jnp.where((iota_w == row_t[None]) & (flip[None] == 1),
                                jnp.int8(1), jnp.int8(0))
        row_0 = rows[:, :, 0].astype(jnp.int32)
        if qn is not None:
            row_0 = jnp.take_along_axis(row_0, qn, axis=0)
        fm = fm ^ jnp.where((iota_w == row_0[None]) & (e[None] == 1),
                            jnp.int8(1), jnp.int8(0))
        c = hd if qn is None else jnp.take_along_axis(hd, qn[None], axis=1)
        return state, c ^ fm

    # ------------------------------------------------------------------
    # trace-time recursion over the decode tree
    # ------------------------------------------------------------------
    def _node(self, state, llr_ch, s: int, lo: int):
        """Process the stage-s node covering [lo, lo + 2^s).
        Returns (state, u_node[2^s, L, bs] int8) — the node's partial sums,
        valid at its completion time."""
        L = self.list_size
        lbuf, u0, pm, y = state
        bs = llr_ch.shape[-1]
        width = 1 << s

        def read_input(lbuf):
            if s == self._S:
                return jnp.broadcast_to(llr_ch[:, None, :],
                                        (self.n, L, bs))
            off = width - 1
            return jax.lax.dynamic_slice_in_dim(lbuf, off, width, axis=0)

        seg_frozen = self._frozen_mask[lo:lo + width]
        clip = lambda x: jnp.clip(x, -self.llr_max, self.llr_max)

        if self.use_fast_scl and s >= 1 and seg_frozen.all():
            # rate-0 subcode: bulk PM update (Hashemi Eq. 26), all-zero sums
            a = read_input(lbuf)
            pm = pm + jnp.sum(_softplus(-clip(a)), axis=0)
            u = jnp.zeros((width, L, bs), dtype=jnp.int8)
            return (lbuf, u0, pm, y), u

        if (self.use_fast_scl and s >= 1 and not seg_frozen[-1]
                and seg_frozen[:-1].all()):
            # repetition subcode: one fork for the repeated bit (Eq. 31)
            a = clip(read_input(lbuf))
            pm0 = pm + jnp.sum(_softplus(-a), axis=0)
            pm1 = pm + jnp.sum(_softplus(a), axis=0)
            pmc = jnp.concatenate([pm0, pm1], axis=0)
            state, ubit, _ = self._fork((lbuf, u0, pm, y), pmc,
                                        last_leaf=lo + width - 1,
                                        min_stage=s)
            u = jnp.broadcast_to(ubit[None, :, :], (width, L, bs)).astype(
                jnp.int8)
            return state, u

        if (self.use_fast_scl and self.fast_rate1 and s >= 1
                and not seg_frozen.any()):
            # rate-1 subcode (Hashemi/Sarkis fast-SSCL): every codeword of
            # the node is admissible, so decode at the node top — no leaf
            # descent. Base PM pays the hard-decision penalty
            # softplus(-|a_w|) per position; then theta = min(L-1, width)
            # sequential forks each offer "flip the t-th least reliable
            # position" (penalty |a|_(t), the exact softplus-PM difference)
            # vs "keep". min(L-1, w) flips lose nothing relative to forking
            # every position (Hashemi et al., Fast-SSCL Thm. 1). Numerics
            # follow the node-top convention of the existing rate-0/rep
            # shortcuts (reference my_sn/fec/polar/dec.py:264-307 ships
            # only those; this extends the same PM contract).
            a = clip(read_input(lbuf))            # [width, L, bs]
            return self._rate1_node((lbuf, u0, pm, y), a, s, lo)

        if (self.use_fast_scl and self.fast_rate1 and s >= self._spc_min
                and seg_frozen[0] and not seg_frozen[1:].any()):
            # single-parity-check subcode (Hashemi fast-SSCL-SPC): decode
            # at the node top over the even-parity codeword set.
            a = clip(read_input(lbuf))
            return self._spc_node((lbuf, u0, pm, y), a, s, lo)

        if s == 0:
            llr0 = lbuf[0]  # [L, bs] — leaf input written by the parent
            if y is not None:
                # TS 38.212 PC register rotates at EVERY leaf
                y = jnp.roll(y, -1, axis=0)
            if seg_frozen[0]:
                pm = pm + _softplus(-clip(llr0))
                u = jnp.zeros((1, L, bs), dtype=jnp.int8)
                return (lbuf, u0, pm, y), u
            if y is not None and self._pc_mask[lo]:
                # dynamically-frozen PC leaf: bit forced to y[0] per path
                u = y[0]  # [L, bs] int8
                sgn = 1.0 - 2.0 * u.astype(jnp.float32)
                pm = pm + _softplus(-sgn * clip(llr0))
                return (lbuf, u0, pm, y), u[None, :, :]
            sp = _softplus(-clip(llr0))
            sn = _softplus(clip(llr0))
            pmc = jnp.concatenate([pm + sp, pm + sn], axis=0)
            state, ubit, _ = self._fork((lbuf, u0, pm, y), pmc, last_leaf=lo,
                                        min_stage=0)
            if y is not None:
                lbuf, u0, pm, y = state
                y = y.at[0].set(y[0] ^ ubit)
                state = (lbuf, u0, pm, y)
            return state, ubit[None, :, :]

        # internal node: f -> left subtree -> g -> right subtree -> combine
        half = width // 2
        child_off = half - 1
        a = read_input(lbuf)
        f_val = self._f(a[:half], a[half:], self.llr_max)
        lbuf = jax.lax.dynamic_update_slice_in_dim(lbuf, f_val, child_off,
                                                   axis=0)
        (lbuf, u0, pm, y), u_l = self._node((lbuf, u0, pm, y), llr_ch,
                                            s - 1, lo)
        # persist the left result where forks in the right subtree can
        # re-permute it
        u0 = jax.lax.dynamic_update_slice_in_dim(u0, u_l, child_off, axis=0)
        a = read_input(lbuf)  # re-read: forks in the left subtree permuted it
        u_l_cur = jax.lax.dynamic_slice_in_dim(u0, child_off, half, axis=0)
        g_val = g_op(a[:half], a[half:], u_l_cur)
        lbuf = jax.lax.dynamic_update_slice_in_dim(lbuf, g_val, child_off,
                                                   axis=0)
        (lbuf, u0, pm, y), u_r = self._node((lbuf, u0, pm, y), llr_ch,
                                            s - 1, lo + half)
        u_l_cur = jax.lax.dynamic_slice_in_dim(u0, child_off, half, axis=0)
        u = jnp.concatenate([u_l_cur ^ u_r, u_r], axis=0)
        return (lbuf, u0, pm, y), u

    # ------------------------------------------------------------------
    def _decode_2d(self, llr_logits):
        """[bs, n] logits -> [bs, k] (or ((bs, k), crc_status[bs]))."""
        bs = llr_logits.shape[0]
        L, n = self.list_size, self.n
        llr_ch = -llr_logits.astype(jnp.float32).T  # [n, bs] true LLRs

        if self.schedule == "scan":
            from polar_tpu.models.polar.scan_core import (
                scl_sweep_hybrid, scl_sweep_hybrid_fast)
            if self.use_fast_scl:
                u_all, pm = scl_sweep_hybrid_fast(
                    llr_ch, self._frozen_mask, L, mode=self.mode,
                    llr_max=self.llr_max, rate1=self.fast_rate1)
            else:
                u_all, pm = scl_sweep_hybrid(llr_ch, self._frozen_mask, L,
                                             mode=self.mode,
                                             llr_max=self.llr_max)
        else:
            lbuf = jnp.zeros((n - 1, L, bs), dtype=jnp.float32)
            u0 = jnp.zeros((n - 1, L, bs), dtype=jnp.int8)
            # path 0 live, clones start at +llr_max penalty (reference
            # polar_scl.py:193-195)
            pm = jnp.full((L, bs), self.llr_max, dtype=jnp.float32)
            pm = pm.at[0].set(0.0)
            y = (jnp.zeros((5, L, bs), dtype=jnp.int8)
                 if self.pc_pos is not None else None)
            (lbuf, u0, pm, y), cw = self._node((lbuf, u0, pm, y), llr_ch,
                                               self._S, 0)
            # decisions u = G c (the polar transform is an involution)
            u_all = polar_transform(cw, axis=0)  # [n, L, bs]

        u_info = jnp.take(u_all, self._info_idx, axis=0)  # [k, L, bs]

        crc_valid = None
        if self._use_crc:
            w = jnp.transpose(u_info, (1, 2, 0)).astype(jnp.float32)
            if self._ind_iil_inv is not None:
                w = jnp.take(w, self._ind_iil_inv, axis=-1)
            _, crc_valid = self._crc_decoder(w)  # [L, bs, 1]
            penalty = (1.0 - crc_valid[..., 0].astype(jnp.float32)) \
                * self.llr_max * self.k
            pm = pm + penalty

        sel = jnp.argmin(pm, axis=0)  # [bs]
        u_sel = jnp.take_along_axis(u_info, sel[None, None, :], axis=1)
        out = u_sel[:, 0, :].T.astype(self.output_dtype)  # [bs, k]
        if self.return_crc_status:
            status = jnp.take_along_axis(crc_valid[..., 0], sel[None, :],
                                         axis=0)[0]
            return out, status
        return out

    def __call__(self, inputs):
        if self._hybrid is not None:
            return self._hybrid(inputs)
        assert inputs.shape[-1] == self.n, "last dim must be of length n"
        assert inputs.ndim > 1, "inputs must have at least 2 dimensions"
        lead = inputs.shape[:-1]
        res = self._jit_decode(inputs.reshape(-1, self.n))
        if self.return_crc_status:
            out, status = res
            return out.reshape(lead + (self.k,)), status.reshape(lead)
        return res.reshape(lead + (self.k,))

    # pure functional entry (for composing into larger jitted programs)
    def decode(self, llr_logits):
        if self._hybrid is not None:
            raise RuntimeError(
                "the hybrid SC/SCL schedule needs a host synchronization to "
                "size the SCL re-decode and cannot run inside jit; call the "
                "decoder (__call__) instead of decode().")
        return self._decode_2d(llr_logits)
