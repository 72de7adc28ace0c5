"""Fused Pallas TPU kernel for the width-2^b SCL subtree.

One ``pallas_call`` replaces the ~700 XLA ops of the unrolled subtree in
``scan_core.scl_sweep_hybrid`` (measured ~5 us of launch overhead per XLA op
on TPU v5e makes op COUNT the bottleneck, not FLOPs). Inside the kernel all
32 leaves run back-to-back on VMEM-resident state:

* workspaces ``lloc`` (LLR segments, f32) and ``uloc`` (partial sums, int32)
  live in VMEM scratch with the compact stage layout (stage s at offset
  2^s - 1);
* forks never copy segments: per-stage **path pointers** (logical->physical
  [L, TB] maps) are re-indexed by the fork's parent selection (one stacked
  gather), and every segment read gathers through its stage pointer — the
  sublane-axis ``take_along_axis`` lowers to the VPU's dynamic-gather;
* the top-L-of-2L survivor selection is L rounds of (min, masked-index-min,
  mask-out) — pure min/where reductions with ``lax.top_k``'s exact tie
  semantics (equal path metrics -> lower candidate index wins), verified
  bit-identical against the XLA engines in tests/test_scan.py;
* frozen leaves are branchless: candidates are computed unconditionally and
  the frozen results (pm + softplus(-v), identity parents, zero bits)
  selected with ``where`` — identical values, no TPU conditional.

The kernel grids over batch tiles (lanes); L=8 rides the f32 sublane tile
exactly. CPU (tests) runs the same kernel under ``interpret=True``.
"""

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from polar_tpu.ops.fg import F_FUNCTIONS, g as g_op
# shared with the XLA mirror engine: the liveness rules in both files must
# stay in lockstep for kernel/XLA bit-identity, so there is ONE definition
# (scan_core has no module-level import of this file — no cycle)
from polar_tpu.models.polar.scan_core import _ctz, _cto, _STALE

_BIG = 3.0e38  # plain float: jnp constants would be captured by the kernel


def _lptr_live(s: int, i_end: int) -> bool:
    """lloc stage-s pointer live after the fork whose node ends at leaf
    ``i_end``: its g-read is still pending iff bit_{s-1}(i_end) == 0
    (stage 0 is consumed before the fork and never read after — always
    dead; stages at or below a pruned node's root are automatically dead
    because the node's low bits of ``i_end`` are all ones)."""
    return s >= 1 and ((i_end >> (s - 1)) & 1) == 0


def _uptr_live(s: int, i_end: int, s_node: int = 0) -> bool:
    """uloc stage-s pointer live after the fork of a node at stage
    ``s_node`` ending at leaf ``i_end``: its combine is still pending iff
    bit_s(i_end) == 1 and the stage is at or above the node root (stages
    below hold no data of the current span — the unrolled engine's
    ``min_stage`` rule, scl.py _fork)."""
    return s >= s_node and ((i_end >> s) & 1) == 1


def _trivial_sched(frz_static):
    """Per-leaf op schedule equivalent to the unpruned sweep: one 'f'/'i'
    op per leaf (the static-frozen-set specialization without fast-SCL
    node pruning)."""
    return tuple(("f" if fz else "i", 0, i)
                 for i, fz in enumerate(frz_static))


def _g8(x2d, ptr):
    """Gather rows of a [8, TB] 32-bit tile by per-lane row index.

    Mosaic's dynamic-gather lowers ``take_along_axis`` only for exactly one
    f32 (8, lanes) tile; integer payloads ride a bitcast (pure data
    movement, so denormal patterns survive)."""
    if x2d.dtype != jnp.float32:
        xf = lax.bitcast_convert_type(x2d, jnp.float32)
        return lax.bitcast_convert_type(
            jnp.take_along_axis(xf, ptr, axis=0), x2d.dtype)
    return jnp.take_along_axis(x2d, ptr, axis=0)


def _gather_rows(x2d, ptr):
    """Per-lane row gather of an [L, TB] tile, L <= 8 (one sublane tile —
    Mosaic's dynamic-gather limit). Larger lists use the blocked kernel
    (``_subtree_kernel_blocked``) instead."""
    assert x2d.shape[0] <= 8, "flat kernel handles one sublane tile only"
    return _g8(x2d, ptr)


def _bitonic_topl_rows(pmc, L):
    """Top-L of the [2L, TB] candidate PMs via a bitonic sorting network
    with an explicit candidate-index tie-break. The (pm, index)
    lexicographic comparator is a strict total order, so the fully
    sorted sequence is unique — the first L rows are EXACTLY
    ``lax.top_k``'s ascending survivors (equal PMs -> lower candidate
    index), bit-identical to the iterative-min extraction. All row moves
    are static power-of-two swaps (reshape + flip), which Mosaic lowers
    without dynamic gathers. Experimental alternative to the iterative
    form (POLAR_TPU_BITONIC_TOPL=1)."""
    n_ = pmc.shape[0]
    TB = pmc.shape[-1]
    pm_s = pmc
    id_s = lax.broadcasted_iota(jnp.int32, (n_, TB), 0)
    # masks derived from an in-kernel iota (a captured numpy constant
    # would be rejected by pallas_call)
    row = lax.broadcasted_iota(jnp.int32, (n_, 1), 0)

    def xperm(x, j):
        # row i -> row i^j: swap the two j-row halves of every 2j block
        # (static slices + concat — Mosaic has no `rev` lowering)
        x4 = x.reshape(n_ // (2 * j), 2, j, TB)
        return jnp.concatenate([x4[:, 1:2], x4[:, 0:1]],
                               axis=1).reshape(n_, TB)

    k = 2
    while k <= n_:
        j = k // 2
        while j >= 1:
            p_pm = xperm(pm_s, j)
            p_id = xperm(id_s, j)
            up = (row & k) == 0           # ascending block
            is_lo = (row & j) == 0        # row is the pair's low index
            want_min = up == is_lo        # [n_, 1], broadcasts over TB
            less = (pm_s < p_pm) | ((pm_s == p_pm) & (id_s < p_id))
            keep_self = jnp.where(want_min, less, ~less)
            pm_s = jnp.where(keep_self, pm_s, p_pm)
            id_s = jnp.where(keep_self, id_s, p_id)
            j //= 2
        k *= 2
    return pm_s[:L], id_s[:L]


def bitonic_topl_default() -> bool:
    """Bitonic top-L in the flat kernel (experimental, bit-identical —
    see _bitonic_topl_rows). Opt-in via POLAR_TPU_BITONIC_TOPL=1."""
    return os.environ.get("POLAR_TPU_BITONIC_TOPL", "0") == "1"


def _subtree_kernel(*refs, b, L, llr_max, mode, frz_static=None,
                    sched_static=None, cond_leaves=False,
                    bitonic_topl=False):
    # frz_static (tuple of 0/1, compile-time) specializes the kernel to
    # one frozen set: frozen leaves keep only the pm update — the top-L
    # selection AND every pointer gather vanish (parent == identity), which
    # is bit-identical to the branchless traced form and roughly halves
    # the fork work on rate-1/2 codes. The traced form (frz in SMEM)
    # remains for the lax.scan outer, where frz is carried data.
    #
    # sched_static (tuple of ('z'|'r'|'f'|'i', stage, lo) ops from
    # scan_core.fast_schedule) additionally prunes the node schedule
    # itself: rate-0 nodes keep only a bulk pm update (Hashemi Eq. 26) and
    # repetition nodes a single fork (Eq. 31), with all descent/rise work
    # below their roots skipped — bit-identical to the unrolled engine's
    # fast-SCL path (scl.py _node).
    if frz_static is None and sched_static is None:
        frz_ref, a_ref, pm_ref, cw_ref, p_ref, pmo_ref, lloc, uloc = refs
    else:
        a_ref, pm_ref, cw_ref, p_ref, pmo_ref, lloc, uloc = refs
    if sched_static is None and frz_static is not None:
        sched_static = _trivial_sched(frz_static)
    # 't' = traced leaf (frozen-ness selected branchlessly from frz_ref)
    sched = (sched_static if sched_static is not None
             else tuple(("t", 0, i) for i in range(1 << b)))
    f = F_FUNCTIONS[mode]
    w_sub = 1 << b
    TB = a_ref.shape[-1]
    off = lambda s: (1 << s) - 1
    ident = lax.broadcasted_iota(jnp.int32, (L, TB), 0)
    iota2l = lax.broadcasted_iota(jnp.int32, (2 * L, TB), 0)
    clip = lambda x: jnp.clip(x, -llr_max, llr_max)
    softplus = lambda x: jnp.logaddexp(0.0, x)

    # Pointer representation: ``None`` means statically-identity (freshly
    # reset by a descent/rise write, no fork since); ``_STALE`` means the
    # segment is provably rewritten before its next read, so its pointer
    # was deliberately NOT composed at the last fork (liveness pruning —
    # the same rule the unrolled engine uses, scl.py _fork: lloc stage s
    # is live at leaf i iff bit_{s-1}(i) == 0, uloc stage s iff
    # bit_s(i) == 1, stage-0 lloc never). Reads assert non-stale. This is
    # all trace-time bookkeeping — the emitted ops are bit-identical to
    # always gathering, minus the provable no-ops.
    lptr = [None] * (b + 1)    # stage-s pointer for lloc
    uptr = [None] * b          # stage-s pointer for uloc
    P = None                   # parent-map composition over the subtree
    pm = pm_ref[:]
    # stage-b LLRs are NOT copied into scratch: reads go straight to the
    # input block (a_ref). Halving the workspace doubles the VMEM-legal
    # batch tile, which halves the grid and with it the kernel's
    # issue-bound tiny-op count.

    def pgather(p, parent):
        return parent if p is None else _gather_rows(p, parent)

    def readl(s):
        assert lptr[s] is not _STALE, f"read of dead lloc stage {s}"
        seg = a_ref[:] if s == b else lloc[off(s):off(s + 1)]
        if lptr[s] is None:
            return seg
        return jnp.stack([_gather_rows(seg[j], lptr[s])
                          for j in range(1 << s)], axis=0)

    def readu(s):
        assert uptr[s] is not _STALE, f"read of dead uloc stage {s}"
        seg = uloc[off(s):off(s + 1)]
        if uptr[s] is None:
            return seg
        return jnp.stack([_gather_rows(seg[j], uptr[s])
                          for j in range(1 << s)], axis=0)

    def top_l(pmc):
        """Iterative min extraction over [2L, TB] candidates — identical
        tie semantics to lax.top_k (equal PMs -> lower candidate index)."""
        if bitonic_topl:
            return _bitonic_topl_rows(pmc, L)
        tmp = pmc
        vals, idxs = [], []
        for _j in range(L):
            val = jnp.min(tmp, axis=0, keepdims=True)   # [1, TB]
            idx = jnp.min(jnp.where(tmp == val, iota2l, 2 * L),
                          axis=0, keepdims=True)
            vals.append(val)
            idxs.append(idx)
            tmp = jnp.where(iota2l == idx, _BIG, tmp)
        return (jnp.concatenate(vals, axis=0),          # [L, TB] ascending
                jnp.concatenate(idxs, axis=0).astype(jnp.int32))

    for kind, s_nd, lo in sched:
        w_nd = 1 << s_nd
        i_end = lo + w_nd - 1
        # ---- descent to the node root (stage s_nd) ----
        # stages above the root are stored for later g-reads; the root
        # value itself is consumed directly and never stored (a later
        # g-entry at stage s_nd - 1 can only occur inside this node's
        # span, which the schedule guarantees is not visited)
        if lo == 0:
            cur = a_ref[:]
            for s in range(b, s_nd, -1):
                h = 1 << (s - 1)
                cur = f(cur[:h], cur[h:], llr_max)
                if s - 1 > s_nd:
                    lloc[off(s - 1):off(s)] = cur
                    lptr[s - 1] = None
                else:
                    lptr[s - 1] = _STALE
        else:
            d = _ctz(lo)
            seg = readl(d + 1)
            h = 1 << d
            cur = g_op(seg[:h], seg[h:], readu(d))
            if d > s_nd:
                lloc[off(d):off(d + 1)] = cur
                lptr[d] = None
            else:
                lptr[d] = _STALE
            for s in range(d, s_nd, -1):
                h = 1 << (s - 1)
                cur = f(cur[:h], cur[h:], llr_max)
                if s - 1 > s_nd:
                    lloc[off(s - 1):off(s)] = cur
                    lptr[s - 1] = None
                else:
                    lptr[s - 1] = _STALE
        # ---- node ----
        if kind == "f":
            # statically frozen leaf: pm update only; parents are the
            # identity, so every pointer gather is a no-op and is skipped
            pm = pm + softplus(-clip(cur[0]))
            ubit = jnp.zeros((1, L, TB), jnp.int32)
        elif kind == "z":
            # rate-0 node: bulk pm update (Eq. 26), all-zero partial sums
            pm = pm + jnp.sum(softplus(-clip(cur)), axis=0)
            ubit = jnp.zeros((w_nd, L, TB), jnp.int32)
        elif kind == "o":
            # rate-1 node (fast_rate1): decode at the node top — base PM
            # pays the hard-decision penalty, then theta = min(L-1, w)
            # sequential forks each offer "flip the t-th least reliable
            # position" (Hashemi fast-SSCL; scl.py _rate1_node semantics).
            # Flip decisions are recorded as (row, flip) pairs and
            # re-permuted per fork — O(theta^2) small gathers instead of
            # theta full [w, L, TB] mask gathers.
            a_c = clip(cur)
            aab = jnp.abs(a_c)
            pm = pm + jnp.sum(softplus(-aab), axis=0)
            hd = (a_c < 0).astype(jnp.int32)
            theta = min(L - 1, w_nd)
            small = w_nd <= L - 1  # theta == w: ROW-order forks, no sort
            iota_w = lax.broadcasted_iota(jnp.int32, (w_nd, L, TB), 0)
            if not small:
                # ascending per-path |LLR| extraction (ties -> lower row)
                tmp = aab
                svals, srows = [], []
                for _t in range(theta):
                    v = jnp.min(tmp, axis=0)                # [L, TB]
                    r_ = jnp.min(jnp.where(tmp == v[None], iota_w, w_nd),
                                 axis=0)
                    svals.append(v)
                    srows.append(r_)
                    tmp = jnp.where(iota_w == r_[None], _BIG, tmp)
            qn = None                  # node-local parent composition
            flips = []                 # per-round flip bits, current order
            for t in range(theta):
                val_t = aab[t] if small else svals[t]
                if qn is not None:
                    val_t = _gather_rows(val_t, qn)
                pmc = jnp.concatenate([pm, pm + val_t], axis=0)
                pm, sel = top_l(pmc)
                parent = sel % L
                flip = sel // L
                qn = pgather(qn, parent)
                flips = [_gather_rows(f_, parent) for f_ in flips]
                flips.append(flip)
                lptr = [pgather(p, parent) if _lptr_live(s, i_end)
                        else _STALE for s, p in enumerate(lptr)]
                uptr = [pgather(p, parent)
                        if _uptr_live(s, i_end, s_nd) else _STALE
                        for s, p in enumerate(uptr)]
                P = pgather(P, parent)
            if qn is None:
                c = hd
            else:
                c = jnp.stack([_gather_rows(hd[j], qn)
                               for j in range(w_nd)], axis=0)
            # rows re-read through the FINAL composition (equivalent to
            # permuting each record at every later fork, minus the work)
            for t, flip in enumerate(flips):
                if small:                    # static row (row-order path)
                    c = c ^ jnp.where(iota_w == t, flip[None], 0)
                else:
                    row_t = _gather_rows(srows[t], qn)
                    c = c ^ jnp.where(
                        (iota_w == row_t[None]) & (flip[None] == 1), 1, 0)
            ubit = c
        elif kind == "s":
            # SPC node (fast_rate1): parity-tracked flip forks (scl.py
            # _spc_node semantics) — min(L, w) - 1 forks, each offering
            # "flip the t-th least reliable position and toggle the least
            # reliable one"
            a_c = clip(cur)
            aab = jnp.abs(a_c)
            hd = (a_c < 0).astype(jnp.int32)
            par = jnp.sum(hd, axis=0) & 1                   # [L, TB]
            theta = min(L, w_nd)
            iota_w = lax.broadcasted_iota(jnp.int32, (w_nd, L, TB), 0)
            tmp = aab
            svals, srows = [], []
            for _t in range(theta):
                v = jnp.min(tmp, axis=0)
                r_ = jnp.min(jnp.where(tmp == v[None], iota_w, w_nd),
                             axis=0)
                svals.append(v)
                srows.append(r_)
                tmp = jnp.where(iota_w == r_[None], _BIG, tmp)
            v0 = svals[0]
            pm = pm + jnp.sum(softplus(-aab), axis=0) \
                + par.astype(jnp.float32) * v0
            e = par
            qn = None
            flips = []
            for t in range(1, theta):
                val_t, v0c = svals[t], v0
                if qn is not None:
                    val_t = _gather_rows(val_t, qn)
                    v0c = _gather_rows(v0, qn)
                pen = val_t + (1.0 - 2.0 * e.astype(jnp.float32)) * v0c
                pmc = jnp.concatenate([pm, pm + pen], axis=0)
                pm, sel = top_l(pmc)
                parent = sel % L
                flip = sel // L
                qn = pgather(qn, parent)
                e = _gather_rows(e, parent) ^ flip
                flips = [_gather_rows(f_, parent) for f_ in flips]
                flips.append(flip)
                lptr = [pgather(p, parent) if _lptr_live(s, i_end)
                        else _STALE for s, p in enumerate(lptr)]
                uptr = [pgather(p, parent)
                        if _uptr_live(s, i_end, s_nd) else _STALE
                        for s, p in enumerate(uptr)]
                P = pgather(P, parent)
            if qn is None:
                c = hd
            else:
                c = jnp.stack([_gather_rows(hd[j], qn)
                               for j in range(w_nd)], axis=0)
            for t, flip in enumerate(flips):
                row_t = _gather_rows(srows[t + 1], qn) if qn is not None \
                    else srows[t + 1]
                c = c ^ jnp.where(
                    (iota_w == row_t[None]) & (flip[None] == 1), 1, 0)
            row_0 = _gather_rows(srows[0], qn) if qn is not None \
                else srows[0]
            c = c ^ jnp.where((iota_w == row_0[None]) & (e[None] == 1),
                              1, 0)
            ubit = c
        else:
            if kind == "r":
                # repetition node: one fork for the repeated bit (Eq. 31)
                a_c = clip(cur)
                pmc = jnp.concatenate(
                    [pm + jnp.sum(softplus(-a_c), axis=0),
                     pm + jnp.sum(softplus(a_c), axis=0)], axis=0)
            else:  # 'i' / 't' leaf fork
                v = clip(cur[0])                       # [L, TB]
                sp_n = softplus(-v)
                if not (kind == "t" and cond_leaves):
                    pmc = jnp.concatenate([pm + sp_n, pm + softplus(v)],
                                          axis=0)
            if kind == "t" and cond_leaves:
                # runtime frozen-leaf skip: branch on the (uniform, SMEM)
                # frozen flag so frozen leaves pay only the pm update — the
                # generic traced kernel recovers most of the static
                # specialization win (which skips the same ops at compile
                # time) without a per-frozen-set executable. Both branches
                # compute the exact expressions of the branchless form, so
                # outputs stay bit-identical to every other engine.
                live_l = [s for s in range(len(lptr))
                          if _lptr_live(s, i_end)]
                live_u = [s for s in range(len(uptr))
                          if _uptr_live(s, i_end, s_nd)]
                mat = lambda p: ident if p is None else p

                def info_br(pm_, lps, ups, P_):
                    pmc_ = jnp.concatenate([pm_ + sp_n, pm_ + softplus(v)],
                                           axis=0)
                    pm_f, sel_ = top_l(pmc_)
                    par = sel_ % L
                    return (pm_f, sel_ // L,
                            [_gather_rows(p, par) for p in lps],
                            [_gather_rows(p, par) for p in ups],
                            _gather_rows(P_, par))

                def frz_br(pm_, lps, ups, P_):
                    return (pm_ + sp_n, jnp.zeros((L, TB), jnp.int32),
                            lps, ups, P_)

                pm, bit, lps_n, ups_n, P = lax.cond(
                    frz_ref[lo] != 0, frz_br, info_br,
                    pm, [mat(lptr[s]) for s in live_l],
                    [mat(uptr[s]) for s in live_u], mat(P))
                ubit = bit[None]                        # [1, L, TB]
                lptr = [lps_n[live_l.index(s)] if s in live_l else _STALE
                        for s in range(len(lptr))]
                uptr = [ups_n[live_u.index(s)] if s in live_u else _STALE
                        for s in range(len(uptr))]
            else:
                pm_fork, sel = top_l(pmc)
                if kind == "t":  # traced frozen-ness: branchless select
                    frz_i = frz_ref[lo] != 0
                    pm = jnp.where(frz_i, pm + sp_n, pm_fork)
                    parent = jnp.where(frz_i, ident, sel % L)
                    ubit = jnp.where(frz_i, jnp.zeros((L, TB), jnp.int32),
                                     sel // L)[None]   # [1, L, TB]
                else:
                    pm = pm_fork
                    parent = sel % L
                    bit = sel // L                      # [L, TB]
                    ubit = (bit[None] if s_nd == 0
                            else jnp.broadcast_to(bit[None],
                                                  (w_nd, L, TB)))
                # liveness-pruned composition: dead stages are rewritten
                # before their next read, so skip their gathers outright
                lptr = [pgather(p, parent) if _lptr_live(s, i_end)
                        else _STALE for s, p in enumerate(lptr)]
                uptr = [pgather(p, parent)
                        if _uptr_live(s, i_end, s_nd) else _STALE
                        for s, p in enumerate(uptr)]
                P = pgather(P, parent)
        # ---- rise: combine partial sums upward ----
        r = _cto(i_end)
        cur_u = ubit
        for s in range(s_nd, min(r, b)):
            cur_u = jnp.concatenate([readu(s) ^ cur_u, cur_u], axis=0)
        if r >= b:
            cw_ref[:] = cur_u                  # subtree codeword (last leaf)
        else:
            uloc[off(r):off(r + 1)] = cur_u
            uptr[r] = None
    p_ref[:] = ident if P is None else P
    pmo_ref[:] = pm


# ----------------------------------------------------------------------
# Blocked kernel for L in {16, 32}
# ----------------------------------------------------------------------
# Mosaic's dynamic-gather only lowers for one f32 (8, lanes) tile, and
# slicing a >8-sublane vector trips vector_extract_strided_slice at wide
# lane tiles (the round-2 L=16 kernel was capped to 128 lanes for this).
# This kernel never materializes a >8-sublane value: every logical [L, TB]
# quantity is a Python list of L/8 separate (8, TB) blocks (loads/stores
# slice the *refs* at tile-aligned offsets), a row gather is nb native
# 8-row gathers combined with >=-selects, and the top-L selection runs
# blockwise with the same global-candidate-index tie semantics as
# lax.top_k. Bit-identical to the XLA engines (tests/test_scan.py) and
# lane-width-unlimited, which lifts both the L=16 128-lane cap and the
# L=32 "no kernel" gap (VERDICT r2 items 2-3).


def _bgather(blocks, ptr_blocks):
    """Blocked row gather: out[l, t] = x[ptr[l, t], t] over logical
    [L, TB] tiles held as lists of (8, TB) blocks."""
    nb = len(blocks)
    out = []
    for h in range(nb):
        p = ptr_blocks[h]
        acc = _g8(blocks[0], jnp.clip(p, 0, 7))
        for g in range(1, nb):
            gg = _g8(blocks[g], jnp.clip(p - 8 * g, 0, 7))
            acc = jnp.where(p >= 8 * g, gg, acc)
        out.append(acc)
    return out


def _subtree_kernel_blocked(*refs, b, L, llr_max, mode, frz_static=None,
                            sched_static=None):
    if frz_static is None and sched_static is None:
        frz_ref, a_ref, pm_ref, cw_ref, p_ref, pmo_ref, lloc, uloc = refs
    else:  # static frozen set / static fast schedule: see _subtree_kernel
        a_ref, pm_ref, cw_ref, p_ref, pmo_ref, lloc, uloc = refs
    if sched_static is None and frz_static is not None:
        sched_static = _trivial_sched(frz_static)
    sched = (sched_static if sched_static is not None
             else tuple(("t", 0, i) for i in range(1 << b)))
    f = F_FUNCTIONS[mode]
    nb = L // 8
    w_sub = 1 << b
    TB = a_ref.shape[-1]
    off = lambda s: (1 << s) - 1
    iota8 = lax.broadcasted_iota(jnp.int32, (8, TB), 0)
    ident = [iota8 + 8 * h for h in range(nb)]        # logical [L, TB]
    clip = lambda x: jnp.clip(x, -llr_max, llr_max)
    softplus = lambda x: jnp.logaddexp(0.0, x)

    # slab helpers: logical [rows, L, TB] <-> list of nb [rows, 8, TB]
    def load_slab(ref, r0, rows):
        return [ref[r0:r0 + rows, 8 * h:8 * h + 8, :] for h in range(nb)]

    def store_slab(ref, r0, slab):
        rows = slab[0].shape[0]
        for h in range(nb):
            ref[r0:r0 + rows, 8 * h:8 * h + 8, :] = slab[h]

    def fg_slab(op, slab_a, slab_b, *extra):
        return [op(slab_a[h], slab_b[h], *[e[h] for e in extra])
                for h in range(nb)]

    # None = statically-identity pointer (see _subtree_kernel): skips the
    # (L/8)^2-gather blocked composition entirely
    lptr = [None] * (b + 1)
    uptr = [None] * b
    P = None
    pm = [pm_ref[8 * h:8 * h + 8, :] for h in range(nb)]  # 2D [L, TB] ref

    def bpgather(p, parent):
        return parent if p is None else _bgather(p, parent)

    def gathered_slab(slab_blocks, ptr):
        """Per-row gather of a logical [rows, L, TB] slab through a
        logical [L, TB] pointer (blocked)."""
        rows = slab_blocks[0].shape[0]
        out = []
        for j in range(rows):
            out.append(_bgather([sb[j] for sb in slab_blocks], ptr))
        # transpose rows-of-blocks -> blocks-of-rows
        return [jnp.stack([out[j][h] for j in range(rows)], axis=0)
                for h in range(nb)]

    def readl(s):
        assert lptr[s] is not _STALE, f"read of dead lloc stage {s}"
        slab = (load_slab(a_ref, 0, w_sub) if s == b
                else load_slab(lloc, off(s), 1 << s))
        if lptr[s] is None:
            return slab
        return gathered_slab(slab, lptr[s])

    def readu(s):
        assert uptr[s] is not _STALE, f"read of dead uloc stage {s}"
        slab = load_slab(uloc, off(s), 1 << s)
        if uptr[s] is None:
            return slab
        return gathered_slab(slab, uptr[s])

    def halves(slab):
        h2 = slab[0].shape[0] // 2
        return [x[:h2] for x in slab], [x[h2:] for x in slab]

    def top_l(cand):
        """Blocked top-L of the 2*nb candidate blocks (candidate block j:
        bit j // nb... candidate GLOBAL index of block j row q = 8*j + q),
        same tie semantics as lax.top_k. Returns (pm_fork, sel) regrouped
        into nb (8, TB) blocks of the L ascending survivors."""
        tmp = list(cand)
        vals, idxs = [], []
        for _j in range(L):  # iterative min extraction == top_k ties
            val = jnp.min(tmp[0], axis=0, keepdims=True)
            for blk in tmp[1:]:
                val = jnp.minimum(val,
                                  jnp.min(blk, axis=0, keepdims=True))
            idx = None
            for jb, blk in enumerate(tmp):
                cand_idx = jnp.where(blk == val, iota8 + 8 * jb, 2 * L)
                m = jnp.min(cand_idx, axis=0, keepdims=True)
                idx = m if idx is None else jnp.minimum(idx, m)
            vals.append(val)
            idxs.append(idx)
            tmp = [jnp.where(iota8 + 8 * jb == idx, _BIG, blk)
                   for jb, blk in enumerate(tmp)]
        # regroup the L extracted rows into nb (8, TB) blocks
        pm_fork = [jnp.concatenate(vals[8 * h:8 * h + 8], axis=0)
                   for h in range(nb)]
        sel = [jnp.concatenate(idxs[8 * h:8 * h + 8], axis=0)
               .astype(jnp.int32) for h in range(nb)]
        return pm_fork, sel

    for kind, s_nd, lo_nd in sched:
        w_nd = 1 << s_nd
        i_end = lo_nd + w_nd - 1
        # ---- descent to the node root (stage s_nd; see _subtree_kernel
        # for the store/skip rules) ----
        if lo_nd == 0:
            cur = load_slab(a_ref, 0, w_sub)
            for s in range(b, s_nd, -1):
                lo, hi = halves(cur)
                cur = [f(lo[h], hi[h], llr_max) for h in range(nb)]
                if s - 1 > s_nd:
                    store_slab(lloc, off(s - 1), cur)
                    lptr[s - 1] = None
                else:
                    lptr[s - 1] = _STALE
        else:
            d = _ctz(lo_nd)
            seg = readl(d + 1)
            lo, hi = halves(seg)
            left = readu(d)
            cur = [g_op(lo[h], hi[h], left[h]) for h in range(nb)]
            if d > s_nd:
                store_slab(lloc, off(d), cur)
                lptr[d] = None
            else:
                lptr[d] = _STALE
            for s in range(d, s_nd, -1):
                lo, hi = halves(cur)
                cur = [f(lo[h], hi[h], llr_max) for h in range(nb)]
                if s - 1 > s_nd:
                    store_slab(lloc, off(s - 1), cur)
                    lptr[s - 1] = None
                else:
                    lptr[s - 1] = _STALE
        # ---- node (blocked) ----
        if kind == "f":
            # statically frozen leaf: pm update only, no selection/gathers
            v = [clip(cur[h][0]) for h in range(nb)]      # [8, TB] x nb
            pm = [pm[h] + softplus(-v[h]) for h in range(nb)]
            ubit = [jnp.zeros((1, 8, TB), jnp.int32) for _ in range(nb)]
        elif kind == "z":
            # rate-0 node: bulk pm update (Eq. 26), all-zero partial sums
            pm = [pm[h] + jnp.sum(softplus(-clip(cur[h])), axis=0)
                  for h in range(nb)]
            ubit = [jnp.zeros((w_nd, 8, TB), jnp.int32) for _ in range(nb)]
        elif kind == "o":
            # rate-1 node (fast_rate1), blocked form of _subtree_kernel's
            # 'o' op: per-block sort (each block holds 8 whole paths),
            # blocked forks, (row, flip) records re-permuted per fork
            a_c = [clip(cur[h]) for h in range(nb)]
            aab = [jnp.abs(x) for x in a_c]
            pm = [pm[h] + jnp.sum(softplus(-aab[h]), axis=0)
                  for h in range(nb)]
            hd = [(x < 0).astype(jnp.int32) for x in a_c]
            theta = min(L - 1, w_nd)
            small = w_nd <= L - 1  # theta == w: ROW-order forks, no sort
            iota_w3 = lax.broadcasted_iota(jnp.int32, (w_nd, 8, TB), 0)
            if not small:
                tmp = list(aab)
                svals, srows = [], []
                for _t in range(theta):
                    v = [jnp.min(tmp[h], axis=0) for h in range(nb)]
                    r_ = [jnp.min(jnp.where(tmp[h] == v[h][None], iota_w3,
                                            w_nd), axis=0)
                          for h in range(nb)]
                    svals.append(v)
                    srows.append(r_)
                    tmp = [jnp.where(iota_w3 == r_[h][None], _BIG, tmp[h])
                           for h in range(nb)]
            qn = None
            flips = []
            for t in range(theta):
                val_t = ([aab[h][t] for h in range(nb)] if small
                         else svals[t])
                if qn is not None:
                    val_t = _bgather(val_t, qn)
                cand = (list(pm)
                        + [pm[h] + val_t[h] for h in range(nb)])
                pm, sel = top_l(cand)
                parent = [sel[h] % L for h in range(nb)]
                flip = [sel[h] // L for h in range(nb)]
                qn = bpgather(qn, parent)
                flips = [_bgather(f_, parent) for f_ in flips]
                flips.append(flip)
                lptr = [bpgather(p, parent) if _lptr_live(s, i_end)
                        else _STALE for s, p in enumerate(lptr)]
                uptr = [bpgather(p, parent)
                        if _uptr_live(s, i_end, s_nd) else _STALE
                        for s, p in enumerate(uptr)]
                P = bpgather(P, parent)
            c = hd if qn is None else gathered_slab(hd, qn)
            # rows re-read through the FINAL composition (see the flat
            # kernel's 'o' op)
            for t, flip in enumerate(flips):
                if small:                    # static row (row-order path)
                    c = [c[h] ^ jnp.where(iota_w3 == t, flip[h][None],
                                          0) for h in range(nb)]
                else:
                    row_t = _bgather(srows[t], qn)
                    c = [c[h] ^ jnp.where((iota_w3 == row_t[h][None])
                                          & (flip[h][None] == 1), 1, 0)
                         for h in range(nb)]
            ubit = c
        elif kind == "s":
            # SPC node (fast_rate1), blocked form of the flat kernel's
            # 's' op
            a_c = [clip(cur[h]) for h in range(nb)]
            aab = [jnp.abs(x) for x in a_c]
            hd = [(x < 0).astype(jnp.int32) for x in a_c]
            par = [jnp.sum(hd[h], axis=0) & 1 for h in range(nb)]
            theta = min(L, w_nd)
            iota_w3 = lax.broadcasted_iota(jnp.int32, (w_nd, 8, TB), 0)
            tmp = list(aab)
            svals, srows = [], []
            for _t in range(theta):
                v = [jnp.min(tmp[h], axis=0) for h in range(nb)]
                r_ = [jnp.min(jnp.where(tmp[h] == v[h][None], iota_w3,
                                        w_nd), axis=0) for h in range(nb)]
                svals.append(v)
                srows.append(r_)
                tmp = [jnp.where(iota_w3 == r_[h][None], _BIG, tmp[h])
                       for h in range(nb)]
            v0 = svals[0]
            pm = [pm[h] + jnp.sum(softplus(-aab[h]), axis=0)
                  + par[h].astype(jnp.float32) * v0[h] for h in range(nb)]
            e = par
            qn = None
            flips = []
            for t in range(1, theta):
                val_t, v0c = svals[t], v0
                if qn is not None:
                    val_t = _bgather(val_t, qn)
                    v0c = _bgather(v0, qn)
                pen = [val_t[h]
                       + (1.0 - 2.0 * e[h].astype(jnp.float32)) * v0c[h]
                       for h in range(nb)]
                cand = list(pm) + [pm[h] + pen[h] for h in range(nb)]
                pm, sel = top_l(cand)
                parent = [sel[h] % L for h in range(nb)]
                flip = [sel[h] // L for h in range(nb)]
                qn = bpgather(qn, parent)
                e = [g ^ f for g, f in zip(_bgather(e, parent), flip)]
                flips = [_bgather(f_, parent) for f_ in flips]
                flips.append(flip)
                lptr = [bpgather(p, parent) if _lptr_live(s, i_end)
                        else _STALE for s, p in enumerate(lptr)]
                uptr = [bpgather(p, parent)
                        if _uptr_live(s, i_end, s_nd) else _STALE
                        for s, p in enumerate(uptr)]
                P = bpgather(P, parent)
            c = hd if qn is None else gathered_slab(hd, qn)
            for t, flip in enumerate(flips):
                row_t = (_bgather(srows[t + 1], qn) if qn is not None
                         else srows[t + 1])
                c = [c[h] ^ jnp.where((iota_w3 == row_t[h][None])
                                      & (flip[h][None] == 1), 1, 0)
                     for h in range(nb)]
            row_0 = _bgather(srows[0], qn) if qn is not None else srows[0]
            c = [c[h] ^ jnp.where((iota_w3 == row_0[h][None])
                                  & (e[h][None] == 1), 1, 0)
                 for h in range(nb)]
            ubit = c
        else:
            if kind == "r":
                # repetition node: one fork for the repeated bit (Eq. 31)
                a_c = [clip(cur[h]) for h in range(nb)]
                cand = ([pm[h] + jnp.sum(softplus(-a_c[h]), axis=0)
                         for h in range(nb)]
                        + [pm[h] + jnp.sum(softplus(a_c[h]), axis=0)
                           for h in range(nb)])
            else:  # 'i' / 't' leaf fork
                v = [clip(cur[h][0]) for h in range(nb)]  # [8, TB] x nb
                sp_n = [softplus(-x) for x in v]
                cand = ([pm[h] + sp_n[h] for h in range(nb)]
                        + [pm[h] + softplus(v[h]) for h in range(nb)])
            pm_fork, sel = top_l(cand)
            if kind == "t":  # traced frozen-ness: branchless select
                frz_i = frz_ref[lo_nd] != 0
                pm = [jnp.where(frz_i, pm[h] + sp_n[h], pm_fork[h])
                      for h in range(nb)]
                parent = [jnp.where(frz_i, ident[h], sel[h] % L)
                          for h in range(nb)]
                ubit = [jnp.where(frz_i, jnp.zeros((8, TB), jnp.int32),
                                  sel[h] // L)[None] for h in range(nb)]
            else:
                pm = pm_fork
                parent = [sel[h] % L for h in range(nb)]
                ubit = [jnp.broadcast_to((sel[h] // L)[None],
                                         (w_nd, 8, TB)) for h in range(nb)]
            # liveness-pruned composition (see _subtree_kernel): dead
            # stages skip their (L/8)^2 blocked gathers entirely
            lptr = [bpgather(p, parent) if _lptr_live(s, i_end) else _STALE
                    for s, p in enumerate(lptr)]
            uptr = [bpgather(p, parent)
                    if _uptr_live(s, i_end, s_nd) else _STALE
                    for s, p in enumerate(uptr)]
            P = bpgather(P, parent)
        # ---- rise: combine partial sums upward ----
        r = _cto(i_end)
        cur_u = ubit                               # [w_nd, 8, TB] x nb
        for s in range(s_nd, min(r, b)):
            left = readu(s)
            cur_u = [jnp.concatenate([left[h] ^ cur_u[h], cur_u[h]], axis=0)
                     for h in range(nb)]
        if r >= b:
            store_slab(cw_ref, 0, cur_u)   # subtree codeword (last leaf)
        else:
            store_slab(uloc, off(r), cur_u)
            uptr[r] = None
    if P is None:
        P = ident
    for h in range(nb):
        p_ref[8 * h:8 * h + 8, :] = P[h]
        pmo_ref[8 * h:8 * h + 8, :] = pm[h]


def _sc_subtree_kernel(*refs, b, llr_max, mode, sched_static=None):
    """SC specialization: no list dimension, no forks — a pure unrolled
    descent/rise sweep over VMEM workspaces with branchless frozen
    decisions. ``a_ref``: [2^b, TB] stage-b LLRs -> ``cw_ref`` [2^b, TB]
    int32 subtree codeword.

    ``sched_static`` (from ``scan_core.fast_schedule(mask, rep=False)``)
    prunes rate-0 nodes: an all-frozen span's partial sums are all-zero
    REGARDLESS of its LLRs, so skipping its descent/rise is bit-identical
    to the plain sweep (unlike SCL there is no path metric to update)."""
    if sched_static is None:
        frz_ref, a_ref, cw_ref, lloc, uloc = refs
        sched = tuple(("t", 0, i) for i in range(1 << b))
    else:
        a_ref, cw_ref, lloc, uloc = refs
        sched = sched_static
    f = F_FUNCTIONS[mode]
    TB = a_ref.shape[-1]
    off = lambda s: (1 << s) - 1
    clip = lambda x: jnp.clip(x, -llr_max, llr_max)

    # stage-b LLRs read straight from the input block (no scratch copy —
    # halves the workspace, doubling the VMEM-legal batch tile)
    for kind, s_nd, lo in sched:
        w_nd = 1 << s_nd
        i_end = lo + w_nd - 1
        # ---- descent to the node root. A rate-0 node needs no value at
        # its root (zero sums regardless of LLRs), but the pass-through
        # STORES above the root still feed later g-reads, so the descent
        # stops at stage s_nd + 1 for 'z' (and is skipped outright when
        # the g-entry lands at or below the root). Other nodes descend to
        # the root; the root value is consumed directly, never stored. ----
        stop = s_nd + 1 if kind == "z" else s_nd
        cur = None
        if lo == 0:
            if b > stop or kind != "z":
                cur = a_ref[:]
                for s in range(b, stop, -1):
                    h = 1 << (s - 1)
                    cur = f(cur[:h], cur[h:], llr_max)
                    if s - 1 > s_nd:
                        lloc[off(s - 1):off(s)] = cur
        else:
            d = _ctz(lo)
            if d >= stop:
                seg = (a_ref[:] if d + 1 == b
                       else lloc[off(d + 1):off(d + 2)])
                h = 1 << d
                cur = g_op(seg[:h], seg[h:], uloc[off(d):off(d + 1)])
                if d > s_nd:
                    lloc[off(d):off(d + 1)] = cur
                for s in range(d, stop, -1):
                    h = 1 << (s - 1)
                    cur = f(cur[:h], cur[h:], llr_max)
                    if s - 1 > s_nd:
                        lloc[off(s - 1):off(s)] = cur
        if kind == "z":
            ubit = jnp.zeros((w_nd, TB), jnp.int32)
        elif kind == "f":
            ubit = jnp.zeros((1, TB), jnp.int32)
        elif kind == "i":
            ubit = (cur <= 0).astype(jnp.int32)  # 0-LLR tie -> bit 1
        else:  # 't': traced frozen-ness
            frz_i = frz_ref[lo] != 0
            ubit = jnp.where(frz_i,
                             jnp.zeros_like(cur, dtype=jnp.int32),
                             (cur <= 0).astype(jnp.int32))
        cur_u = ubit
        r = _cto(i_end)
        for s in range(s_nd, min(r, b)):
            cur_u = jnp.concatenate(
                [uloc[off(s):off(s + 1)] ^ cur_u, cur_u], axis=0)
        if r >= b:
            cw_ref[:] = cur_u
        else:
            uloc[off(r):off(r + 1)] = cur_u


@functools.partial(jax.jit, static_argnames=("b", "llr_max", "mode",
                                             "interpret", "tile",
                                             "sched_static"))
def sc_subtree_pallas(a, frz, *, b, llr_max, mode, interpret=False,
                      tile=None, sched_static=None):
    """Fused SC subtree. ``a``: [2^b, bs] f32 stage-b LLRs, ``frz``:
    [2^b] int32 (pass None with ``sched_static``) -> cw [2^b, bs] int32.

    ``sched_static`` (from ``scan_core.fast_schedule(mask, rep=False)``)
    compiles the rate-0-pruned sweep — bit-identical to the plain one."""
    w_sub, bs = a.shape
    assert w_sub == (1 << b)
    W = (1 << b) - 1  # stages 0..b-1; stage b reads the input block
    vlim = _vmem_limit_override()
    # the unrolled SC body SPILLS live vectors to the VMEM stack on top of
    # blocks+scratch, roughly doubling the footprint at wide batch tiles
    # (measured: b=10 TB=512 -> 17.04M vs the 8.0M model; b=8 TB=2048 and
    # b=6 TB=8192, both ~8M modeled, also stack-OOM cold, while the
    # half-tile configs ~4M modeled compile). Budget 2.2x at every b; the
    # (listful) SCL kernel runs much smaller tiles and matches the plain
    # model exactly, so it keeps the uninflated accounting.
    bytes_fn = lambda t: int(2.2 * sc_vmem_bytes(b, t))
    TB = tile if tile is not None else fit_tile(
        bs, bytes_fn, vmem_limit=vlim)
    TB = min(TB, bs)
    assert bs % TB == 0
    kern = functools.partial(_sc_subtree_kernel, b=b,
                             llr_max=float(llr_max), mode=mode,
                             sched_static=sched_static)
    bspec = pl.BlockSpec((w_sub, TB), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    in_specs = [bspec]
    inputs = (a,)
    if sched_static is None:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        inputs = (frz, a)
    return pl.pallas_call(
        kern,
        grid=(bs // TB,),
        in_specs=in_specs,
        out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct((w_sub, bs), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((W, TB), jnp.float32),
            pltpu.VMEM((W, TB), jnp.int32),
        ],
        compiler_params=(None if vlim is None
                         else pltpu.CompilerParams(vmem_limit_bytes=vlim)),
        interpret=interpret,
    )(*inputs)


# ----------------------------------------------------------------------
# VMEM accounting
# ----------------------------------------------------------------------
# Mosaic checks (scratch + ALL in/out blocks) of a kernel against the
# scoped-VMEM limit (16 MiB by default). Calibration from the round-2
# driver OOM: b=9, L=8, TB=256 -> this model gives 16.008 MiB and the
# compiler reported "16.02M requested vs 16.00M limit", i.e. the model is
# exact to ~16 KiB. We keep 512 KiB of headroom for the compiler's own
# staging, so a config this model accepts compiles cold (no compile cache).
VMEM_LIMIT_BYTES = 16 * 2 ** 20
VMEM_HEADROOM_BYTES = 512 * 1024


def _vmem_limit_override() -> int | None:
    """Optional scoped-VMEM limit raise (MiB), passed to Mosaic via
    ``CompilerParams(vmem_limit_bytes=...)``. The v5e core has more
    physical VMEM than the 16 MiB default scoped limit; raising it lets
    bigger (b, tile) kernel configs compile. Opt-in via env because the
    ceiling is backend-specific."""
    v = os.environ.get("POLAR_TPU_VMEM_LIMIT_MIB")
    return None if v is None else int(v) * 2 ** 20


def scl_vmem_bytes(b: int, L: int, tb: int, cond: bool = False,
                   o_span: int = 0) -> int:
    """Total VMEM footprint of ``subtree_pallas`` at batch tile ``tb``:
    scratch (lloc f32 + uloc i32, 2^b - 1 rows each) plus the in/out
    blocks (a f32 + cw i32, 2^b rows each; pm in + P/pm out, 3 rows).

    ``cond=True`` budgets the cond-leaves kernel's measured ~2x VMEM-stack
    spill (each scf.if region's operands/results get stack slots the
    branchless form doesn't need: b=9 L=8 TB=128 -> 17.01M actual vs 8.39M
    modeled; 2.2x keeps headroom).

    ``o_span`` (max 2^s over the schedule's rate-1 'o' ops, 0 if none)
    budgets the extra live [o_span, L, tb] node temps the rate-1 op keeps
    on the VMEM stack (|LLR|, masked extraction copy, hard decisions,
    flip one-hots — ~4 arrays) on top of the descent value the other node
    kinds also hold."""
    w = 1 << b
    base = 4 * L * tb * (2 * (w - 1) + 2 * w + 3)
    base += 4 * 4 * L * tb * int(o_span)
    return int(2.2 * base) if cond else base


def sc_vmem_bytes(b: int, tb: int) -> int:
    """Footprint of ``sc_subtree_pallas``: scratch (2 x (2^b - 1) rows)
    plus a/cw blocks (2 x 2^b rows), 4 bytes each, no list axis."""
    w = 1 << b
    return 4 * tb * (2 * (w - 1) + 2 * w)


def fit_tile(bs: int, bytes_fn, vmem_limit: int | None = None) -> int:
    """Largest 128-multiple batch tile dividing ``bs`` whose total kernel
    VMEM footprint (``bytes_fn(tb)``) fits under the scoped-VMEM budget.

    Raises ValueError when even the minimum tile cannot fit — callers
    (engine auto-selection, bench) treat that as "pick a smaller b"."""
    limit = VMEM_LIMIT_BYTES if vmem_limit is None else vmem_limit
    budget = limit - VMEM_HEADROOM_BYTES
    if bs % 128:
        # unaligned batch: a single whole-batch tile is the only legal grid
        if bytes_fn(bs) > budget:
            raise ValueError(
                f"pallas subtree kernel needs {bytes_fn(bs)} B of VMEM at "
                f"the (unaligned) whole-batch tile bs={bs}, over the "
                f"{budget} B budget — reduce lower_stages or pad bs to a "
                f"multiple of 128")
        return bs
    tb = bs
    while tb > 128 and (bs % tb or bytes_fn(tb) > budget):
        tb -= 128
    if bytes_fn(tb) > budget:
        raise ValueError(
            f"pallas subtree kernel needs {bytes_fn(tb)} B of VMEM at the "
            f"minimum tile tb=128, over the {budget} B budget — reduce "
            f"lower_stages")
    return tb


def cond_leaves_default() -> bool:
    """Runtime frozen-leaf skip (lax.cond on the SMEM frozen flag) in the
    generic traced kernel. Opt-in via ``POLAR_TPU_COND_KERNEL=1`` until the
    Mosaic lowering is validated on the target backend; bit-identical to
    the branchless form either way (tests/test_scan.py)."""
    return os.environ.get("POLAR_TPU_COND_KERNEL", "0") == "1"


@functools.partial(jax.jit, static_argnames=("b", "L", "llr_max", "mode",
                                             "interpret", "tile",
                                             "frz_static", "sched_static",
                                             "cond_leaves"))
def subtree_pallas(a, frz, pm, *, b, L, llr_max, mode, interpret=False,
                   tile=None, frz_static=None, sched_static=None,
                   cond_leaves=False):
    """Run the fused subtree kernel. ``a``: [2^b, L, bs] f32 stage-b LLRs,
    ``frz``: [2^b] int32 (pass None with ``frz_static``/``sched_static``),
    ``pm``: [L, bs] f32. Returns (cw [2^b, L, bs] int32, P [L, bs] int32,
    pm [L, bs] f32).

    ``frz_static`` (tuple of 0/1, hashable) compiles a code-specialized
    kernel: statically frozen leaves skip the top-L selection and all
    pointer gathers — bit-identical to the traced form, ~half the fork
    work on rate-1/2 codes (one executable per frozen set).

    ``sched_static`` (tuple of (kind, stage, lo) ops from
    ``scan_core.fast_schedule``) compiles the fast-SCL pruned kernel
    (Hashemi rate-0 / repetition shortcuts, reference default
    ``use_fast_scl=True`` — my_sn/fec/polar/dec.py:264-307); mutually
    redundant with frz_static (the schedule fixes the frozen set).
    Schedules from ``fast_schedule(..., rate1=True)`` additionally carry
    'o' (rate-1) ops: theta = min(L-1, 2^s) least-reliable-flip forks at
    the node top with no leaf descent (the ``fast_rate1`` contract)."""
    w_sub, L_, bs = a.shape
    assert w_sub == (1 << b) and L_ == L
    W = (1 << b) - 1  # stages 0..b-1 only; stage b reads the input block
    static = frz_static is not None or sched_static is not None
    cond_on = bool(cond_leaves) and not static and L <= 8
    vlim = _vmem_limit_override()
    o_span = max((1 << s for kind, s, _ in (sched_static or ())
                  if kind in ("o", "s")), default=0)
    TB = tile if tile is not None else fit_tile(
        bs, lambda t: scl_vmem_bytes(b, L, t, cond=cond_on, o_span=o_span),
        vmem_limit=vlim)
    TB = min(TB, bs)
    assert bs % TB == 0, f"bs={bs} must be a multiple of the tile {TB}"
    grid = (bs // TB,)
    # L <= 8 rides the native one-tile dynamic-gather; larger lists use the
    # blocked kernel (lists of (8, TB) blocks, no >8-sublane values), which
    # has no lane-width cap
    assert L <= 8 or L % 8 == 0, "list sizes above 8 must be multiples of 8"
    if frz_static is not None:
        assert len(frz_static) == w_sub
        frz_static = tuple(int(x) for x in frz_static)
    if L <= 8:
        kern = functools.partial(
            _subtree_kernel, b=b, L=L, llr_max=float(llr_max), mode=mode,
            frz_static=frz_static, sched_static=sched_static,
            # runtime skip only applies to traced ('t') leaves
            cond_leaves=cond_on,
            # static so the choice participates in the jit cache key
            bitonic_topl=bitonic_topl_default())
    else:
        kern = functools.partial(
            _subtree_kernel_blocked, b=b, L=L, llr_max=float(llr_max),
            mode=mode, frz_static=frz_static, sched_static=sched_static)
    bspec = lambda rows: pl.BlockSpec((rows, L, TB),
                                      lambda i: (0, 0, i),
                                      memory_space=pltpu.VMEM)
    bspec2 = pl.BlockSpec((L, TB), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    in_specs = [bspec(w_sub), bspec2]               # a, pm
    inputs = (a, pm)
    if not static:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        inputs = (frz,) + inputs
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=[bspec(w_sub), bspec2, bspec2],
        out_shape=[
            jax.ShapeDtypeStruct((w_sub, L, bs), jnp.int32),
            jax.ShapeDtypeStruct((L, bs), jnp.int32),
            jax.ShapeDtypeStruct((L, bs), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((W, L, TB), jnp.float32),
            pltpu.VMEM((W, L, TB), jnp.int32),
        ],
        compiler_params=(None if vlim is None
                         else pltpu.CompilerParams(vmem_limit_bytes=vlim)),
        interpret=interpret,
    )(*inputs)
