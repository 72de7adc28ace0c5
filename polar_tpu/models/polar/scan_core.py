"""Scan-based SC/SCL decode sweeps for large blocklengths.

The unrolled-tree decoders (``sc.py``/``scl.py``) emit O(n) XLA ops — ideal
at short blocklengths, but XLA compile time explodes for n >= 512 (measured
~380 s for SCL-8 at n=1024 on TPU v5e, vs ~10 s for this module). This
module implements the same algorithms as ONE ``lax.scan`` over the n
leaves, so the compiled program size is O(log^2 n) regardless of n:

* the per-leaf **descent** (recompute LLR segments down to stage 0) and
  **rise** (propagate partial sums up) have leaf-dependent depth; each depth
  is a separate ``lax.switch`` branch with *static* widths — at leaf ``i``
  the descent starts at stage ``ctz(i)`` with one g-update and continues
  with f-updates to stage 0, and the rise combines through ``cto(i)``
  (trailing ones) stages. Total work stays the optimal O(n log n) per path.
* stage workspaces are a **pytree of per-stage arrays** (stage ``s``:
  ``[2^s, L, bs]``), NOT one packed buffer: a switch branch returns
  untouched stages by identity, so XLA's loop aliasing keeps per-leaf
  memory traffic proportional to the segment actually recomputed instead
  of copying an O(n·L·bs) workspace every iteration.
* SCL forks do NOT copy workspaces. Each stage carries a **path pointer**
  (``lperm``/``uperm``: [S, L, bs] logical-path -> physical-slot maps);
  a fork re-indexes the pointers (O(S·L·bs)) and every segment read gathers
  through its stage pointer. This is the functional analogue of the
  reference's ``_dec_pointer`` in-place trick
  (``x_run_sn_polar/polar/polar_scl.py:86-120``), without the in-place sort.
* decisions are never stored per-leaf: the final rise (leaf n-1) yields the
  full per-path codeword, and ``u = polar_transform(cw)`` recovers the
  decision vector (the transform is an involution over GF(2)).

Path-metric semantics are identical to the unrolled decoders (same clipped
softplus updates, Stimming Eq. 10), so outputs are bit-identical up to PM
ties; equivalence is asserted in tests/test_scan.py.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from polar_tpu.ops.fg import F_FUNCTIONS, g as g_op
from polar_tpu.ops.butterfly import polar_transform


def _softplus(x):
    return jnp.logaddexp(0.0, x)


def _pvary_like(x, ref):
    """Mark a constant-built array as varying over the same manual mesh
    axes as ``ref`` (no-op outside ``shard_map``).

    The scan carries below are initialized from ``jnp.zeros``/``full``
    constants. Under ``shard_map`` those are *unvarying* in JAX's
    varying-manual-axes type system while the llr-derived values written
    into the same carry slots by later switch branches are varying — and
    ``lax.switch`` requires all branches to return identical types. Seeding
    the initial carry as varying-like-the-input makes every branch agree.
    """
    try:
        missing = jax.typeof(ref).vma - jax.typeof(x).vma
    except (AttributeError, TypeError):  # not under tracing w/ vma support
        return x
    for ax in missing:
        x = lax.pcast(x, ax, to="varying")
    return x


def _ctz(i: int) -> int:
    return (i & -i).bit_length() - 1


def _cto(i: int) -> int:
    c = 0
    while i & 1:
        c += 1
        i >>= 1
    return c


def leaf_schedule(n: int):
    """Per-leaf (descent_id, rise_id) branch indices.

    descent_id = ctz(i) for i > 0 (g-update at that stage, then f to stage
    0); leaf 0 uses branch S (pure f-descent from the channel LLRs).
    rise_id = count of trailing ones of i (stages combined upward); leaf
    n-1 has rise_id = S, which materializes the codeword.
    """
    S = int(np.log2(n))
    desc = np.array([S] + [_ctz(i) for i in range(1, n)], dtype=np.int32)
    rise = np.array([_cto(i) for i in range(n)], dtype=np.int32)
    return S, desc, rise


# SPC ('s') node formation threshold. Measured on the v5e headline
# (k=512, n=1024, L=8, b=9, bs=8192): enabling SPC at stage >= 4 REGRESSES
# the chain 405.8M -> 340-344M bit/s — the node-top machinery (theta
# reliability-extraction sweeps + theta one-hot flip applies) scales
# theta*w vector-ops, while the r/o decomposition it replaces halves w
# per level (geometric sum), so on a vector kernel the decomposition wins
# even though SPC saves forks (233 vs 310). The scalar-hardware fast-SSCL
# literature assumes fork cost dominates; here top-L over 2L lanes is
# cheap. SPC therefore ships OFF (stage threshold 99) and stays available
# for experimentation via POLAR_TPU_SPC_MIN_STAGE (tests pin 4).
SPC_MIN_STAGE_OFF = 99


def resolve_spc_min_stage(value=None) -> int:
    """SPC formation threshold: explicit value, else the
    POLAR_TPU_SPC_MIN_STAGE env, else disabled."""
    if value is not None:
        return int(value)
    return int(os.environ.get("POLAR_TPU_SPC_MIN_STAGE",
                              str(SPC_MIN_STAGE_OFF)))


def fast_schedule(frozen_mask, rep: bool = True, rate1: bool = False,
                  spc_min_stage=None):
    """Fast-SCL pruned node schedule (Hashemi rate-0 / repetition), exactly
    mirroring the unrolled engine's recursion (scl.py _node: a node at
    stage >= 1 prunes if its whole span is frozen — Eq. 26 bulk PM update —
    or if everything but its LAST leaf is frozen — Eq. 31 one-fork
    repetition). Returns ops in leaf order:

        ('z', s, lo)  rate-0 node covering [lo, lo + 2^s)
        ('r', s, lo)  repetition node
        ('o', s, lo)  rate-1 (all-info) node, only with ``rate1=True``
        ('f', 0, lo)  frozen leaf
        ('i', 0, lo)  info leaf

    ``rep=False`` emits only rate-0 prunes — for SC, where a rate-0 node's
    partial sums are all-zero regardless of its LLRs, so the pruned sweep
    is bit-identical to the plain one (repetition shortcuts would not be).

    ``rate1=True`` additionally prunes all-info nodes — ``('o', s, lo)``,
    theta = min(L-1, 2^s) least-reliable-flip forks at the node top, no
    leaf descent — and single-parity-check nodes (only the FIRST leaf
    frozen) of span >= 2^SPC_MIN_STAGE — ``('s', s, lo)``, min(L, 2^s)-1
    parity-tracked flip forks. Below the span threshold the r/o
    decomposition costs the same number of forks without SPC's sort and
    parity machinery, so small SPC nodes stay decomposed. Together these
    are the opt-in ``fast_rate1`` engine contract (Hashemi fast-SSCL/SPC),
    beyond the reference's rate-0/rep set.
    """
    mask = np.asarray(frozen_mask, dtype=bool)
    n = len(mask)
    ops = []
    spc_min = resolve_spc_min_stage(spc_min_stage)

    def rec(s, lo):
        w = 1 << s
        seg = mask[lo:lo + w]
        if s >= 1 and seg.all():
            ops.append(("z", s, lo))
        elif rep and s >= 1 and not seg[-1] and seg[:-1].all():
            ops.append(("r", s, lo))
        elif rate1 and s >= 1 and not seg.any():
            ops.append(("o", s, lo))
        elif (rate1 and s >= spc_min and seg[0]
                and not seg[1:].any()):
            ops.append(("s", s, lo))
        elif s == 0:
            ops.append(("f" if seg[0] else "i", 0, lo))
        else:
            rec(s - 1, lo)
            rec(s - 1, lo + w // 2)

    rec(int(np.log2(n)), 0)
    return ops


def split_fast_schedule(frozen_mask, b, rate1: bool = False):
    """Partition the global fast schedule at the two-level boundary 2^b.

    Returns ``(units, has_upper_rep)`` where ``units`` is a leaf-ordered
    list of either ``('sub', j, sched_j)`` — subtree ``j`` with its local
    op tuple (stages <= b, ``lo`` subtree-local) — or ``('z'|'r'|'o', s,
    j0, q)`` — an upper node at stage ``s > b`` covering the
    ``q = 2^(s-b)`` subtrees starting at ``j0``. Upper repetition nodes
    (possible only in pathological frozen sets) are flagged, not split.
    Upper rate-1 nodes (``rate1=True``, high-rate codes) are handled at
    their true stage so the sweep stays bit-identical to the unrolled
    engine for any subtree depth ``b``."""
    units, has_upper_rep = [], False
    cur_j, cur_ops = None, []

    def flush():
        nonlocal cur_j, cur_ops
        if cur_j is not None:
            units.append(("sub", cur_j, tuple(cur_ops)))
            cur_j, cur_ops = None, []

    for kind, s, lo in fast_schedule(frozen_mask, rate1=rate1):
        if s > b:
            flush()
            if kind == "r":
                has_upper_rep = True
            units.append((kind, s, lo >> b, 1 << (s - b)))
        else:
            j = lo >> b
            if j != cur_j:
                flush()
                cur_j = j
            cur_ops.append((kind, s, lo - (j << b)))
    flush()
    return units, has_upper_rep


def _replace(t, i, v):
    """Tuple with element i replaced (branches must keep pytree structure)."""
    return t[:i] + (v,) + t[i + 1:]


def _replace_many(t, items):
    lst = list(t)
    for i, v in items:
        lst[i] = v
    return tuple(lst)


# ----------------------------------------------------------------------
# SC (single path, no pointers needed)
# ----------------------------------------------------------------------
def sc_sweep(llr_ch, frozen_mask, mode: str = "minsum",
             llr_max: float = 30.0):
    """Scan-based SC sweep. ``llr_ch``: [n, bs] true LLRs (already negated
    from logits). Returns the decision vector ``u``: [n, bs] int8."""
    n, bs = llr_ch.shape
    S, desc_ids, rise_ids = leaf_schedule(n)
    f = F_FUNCTIONS[mode]
    frozen = jnp.asarray(np.asarray(frozen_mask), dtype=jnp.bool_)

    # carry: (lbuf_0..lbuf_{S-1}, u0_0..u0_{S-1}, cw); stage s is [2^s, bs]
    def make_descent(d):
        def branch(carry):
            lbufs, u0s, cw = carry[:S], carry[S:2 * S], carry[2 * S]
            w = 1 << (d + 1)
            a = llr_ch if (d + 1) == S else lbufs[d + 1]
            cur = g_op(a[:w // 2], a[w // 2:], u0s[d])
            upd = [(d, cur)]
            for s in range(d, 0, -1):
                h = 1 << (s - 1)
                cur = f(cur[:h], cur[h:], llr_max)
                upd.append((s - 1, cur))
            return _replace_many(carry, upd)
        return branch

    def root_descent(carry):
        cur = llr_ch
        upd = []
        for s in range(S, 0, -1):
            h = 1 << (s - 1)
            cur = f(cur[:h], cur[h:], llr_max)
            upd.append((s - 1, cur))
        return _replace_many(carry, upd)

    descent_branches = [make_descent(d) for d in range(S)] + [root_descent]

    def make_rise(r):
        def branch(carry_ubit):
            carry, ubit = carry_ubit[:-1], carry_ubit[-1]
            u0s = carry[S:2 * S]
            cur = ubit
            for s in range(r):
                cur = jnp.concatenate([u0s[s] ^ cur, cur], axis=0)
            if r < S:
                return _replace(carry, S + r, cur) + (ubit,)
            return _replace(carry, 2 * S, cur) + (ubit,)
        return branch

    rise_branches = [make_rise(r) for r in range(S + 1)]

    def body(carry, x):
        desc_id, rise_id, is_frozen = x
        carry = lax.switch(desc_id, descent_branches, carry)
        llr0 = carry[0]  # [1, bs], freshly written by the descent
        # frozen -> 0; else hard decision with the reference's 0-LLR -> 1
        ubit = jnp.where(is_frozen, jnp.zeros_like(llr0, dtype=jnp.int8),
                         (llr0 <= 0).astype(jnp.int8))
        carry = lax.switch(rise_id, rise_branches, carry + (ubit,))[:-1]
        return carry, None

    pv = lambda x: _pvary_like(x, llr_ch)
    lbufs = tuple(pv(jnp.zeros((1 << s, bs), jnp.float32)) for s in range(S))
    u0s = tuple(pv(jnp.zeros((1 << s, bs), jnp.int8)) for s in range(S))
    cw0 = pv(jnp.zeros((n, bs), jnp.int8))
    carry, _ = lax.scan(
        body, lbufs + u0s + (cw0,),
        (jnp.asarray(desc_ids), jnp.asarray(rise_ids), frozen))
    # the final rise materialized the codeword; the transform (an involution)
    # recovers the decisions
    return polar_transform(carry[2 * S], axis=0)


# ----------------------------------------------------------------------
# SCL (L paths, lazy path pointers)
# ----------------------------------------------------------------------
def scl_sweep(llr_ch, frozen_mask, list_size: int, mode: str = "minsum",
              llr_max: float = 30.0):
    """Scan-based SCL sweep. ``llr_ch``: [n, bs] true LLRs. Returns
    ``(u [n, L, bs] int8, pm [L, bs] f32)`` — per-path decision vectors in
    final logical order plus their path metrics (consumed by scl.py's
    CRC/argmin selection tail)."""
    n, bs = llr_ch.shape
    L = int(list_size)
    S, desc_ids, rise_ids = leaf_schedule(n)
    f = F_FUNCTIONS[mode]
    frozen = jnp.asarray(np.asarray(frozen_mask), dtype=jnp.bool_)
    llr_bc = jnp.broadcast_to(llr_ch[:, None, :], (n, L, bs))
    ident = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[:, None],
                             (L, bs))
    clip = lambda x: jnp.clip(x, -llr_max, llr_max)

    # carry layout (tuple): 0..S-1 lbuf stages [2^s, L, bs] f32,
    # S..2S-1 u0 stages [2^s, L, bs] int8, 2S: lperm [S, L, bs] int32,
    # 2S+1: uperm, 2S+2: pm [L, bs] f32, 2S+3: cw [n, L, bs] int8
    I_LP, I_UP, I_PM, I_CW = 2 * S, 2 * S + 1, 2 * S + 2, 2 * S + 3

    def read(seg, perm_row):
        return jnp.take_along_axis(seg, perm_row[None], axis=1)

    def make_descent(d):
        def branch(carry):
            lperm, uperm = carry[I_LP], carry[I_UP]
            w = 1 << (d + 1)
            a = (llr_bc if (d + 1) == S
                 else read(carry[d + 1], lperm[d + 1]))
            left = read(carry[S + d], uperm[d])
            cur = g_op(a[:w // 2], a[w // 2:], left)
            upd = [(d, cur)]
            for s in range(d, 0, -1):
                h = 1 << (s - 1)
                cur = f(cur[:h], cur[h:], llr_max)
                upd.append((s - 1, cur))
            upd.append((I_LP, lperm.at[0:d + 1].set(ident)))
            return _replace_many(carry, upd)
        return branch

    def root_descent(carry):
        cur = llr_bc
        upd = []
        for s in range(S, 0, -1):
            h = 1 << (s - 1)
            cur = f(cur[:h], cur[h:], llr_max)
            upd.append((s - 1, cur))
        upd.append((I_LP, carry[I_LP].at[0:S].set(ident)))
        return _replace_many(carry, upd)

    descent_branches = [make_descent(d) for d in range(S)] + [root_descent]

    def make_rise(r):
        def branch(carry_ubit):
            carry, ubit = carry_ubit[:-1], carry_ubit[-1]
            uperm = carry[I_UP]
            cur = ubit
            for s in range(r):
                left = read(carry[S + s], uperm[s])
                cur = jnp.concatenate([left ^ cur, cur], axis=0)
            if r < S:
                return _replace_many(
                    carry, [(S + r, cur),
                            (I_UP, uperm.at[r].set(ident))]) + (ubit,)
            return _replace(carry, I_CW, cur) + (ubit,)
        return branch

    rise_branches = [make_rise(r) for r in range(S + 1)]

    def frozen_leaf(op):
        lperm, uperm, pm, llr0 = op
        pm = pm + _softplus(-clip(llr0[0]))
        # pvary: fork_leaf's ubit is llr-derived (varying under shard_map);
        # cond branches must return identical types
        return (lperm, uperm, pm,
                _pvary_like(jnp.zeros((1, L, bs), jnp.int8), llr0))

    def fork_leaf(op):
        lperm, uperm, pm, llr0 = op
        v = clip(llr0[0])  # [L, bs]
        pmc = jnp.concatenate([pm + _softplus(-v), pm + _softplus(v)],
                              axis=0)  # [2L, bs]
        neg_vals, idx = lax.top_k(-pmc.T, L)  # [bs, L]
        pm = (-neg_vals).T
        parent = (idx % L).T.astype(jnp.int32)  # [L, bs]
        ubit = (idx // L).T.astype(jnp.int8)[None]  # [1, L, bs]
        lperm = jnp.take_along_axis(lperm, parent[None], axis=1)
        uperm = jnp.take_along_axis(uperm, parent[None], axis=1)
        return lperm, uperm, pm, ubit

    def body(carry, x):
        desc_id, rise_id, is_frozen = x
        carry = lax.switch(desc_id, descent_branches, carry)
        llr0 = read(carry[0], carry[I_LP][0])
        lperm, uperm, pm, ubit = lax.cond(
            is_frozen, frozen_leaf, fork_leaf,
            (carry[I_LP], carry[I_UP], carry[I_PM], llr0))
        carry = _replace_many(carry, [(I_LP, lperm), (I_UP, uperm),
                                      (I_PM, pm)])
        carry = lax.switch(rise_id, rise_branches, carry + (ubit,))[:-1]
        return carry, None

    pv = lambda x: _pvary_like(x, llr_ch)
    lbufs = tuple(pv(jnp.zeros((1 << s, L, bs), jnp.float32))
                  for s in range(S))
    u0s = tuple(pv(jnp.zeros((1 << s, L, bs), jnp.int8)) for s in range(S))
    lperm0 = pv(jnp.broadcast_to(ident[None], (S, L, bs)).astype(jnp.int32))
    # path 0 live, clones start at +llr_max penalty (reference
    # polar_scl.py:193-195)
    pm0 = pv(jnp.full((L, bs), llr_max, jnp.float32).at[0].set(0.0))
    cw0 = pv(jnp.zeros((n, L, bs), jnp.int8))
    carry = lbufs + u0s + (lperm0, lperm0, pm0, cw0)
    carry, _ = lax.scan(
        body, carry,
        (jnp.asarray(desc_ids), jnp.asarray(rise_ids), frozen))
    return polar_transform(carry[I_CW], axis=0), carry[I_PM]


# ----------------------------------------------------------------------
# Two-level hybrid sweeps: scan over super-leaves, unrolled subtrees
# ----------------------------------------------------------------------
# Measured on TPU v5e (n=1024, L=8, bs=1024): the leaf-per-iteration scans
# above are bound NOT by f/g compute or forks but by the carry volume that
# every lax.switch round-trips each iteration (~45 MB x 2 switches x n
# iterations). Processing one *subtree of 2^b leaves* per iteration keeps
# the big upper-stage carry traffic at n/2^b iterations while the subtree
# itself is straight-line code on small local values.

# Subtree depth (lower_stages) policy. ``None`` = auto: on TPU, pick the
# largest depth whose fused Pallas kernel fits scoped VMEM (exact model in
# pallas_scl), capped at the measured perf sweet spot; on CPU/XLA, use a
# compile-time-friendly 5. ``POLAR_TPU_LOWER_STAGES`` overrides everything
# (read at call time — the test suite sets 3 to compile ~3x faster with
# identical outputs; engine-equivalence across lower_stages is asserted in
# tests/test_scan.py).
DEFAULT_LOWER_STAGES = None

# measured full-chain sweet spots on TPU v5e at bs=8192 (see
# polar-tpu-perf-history): SCL-8 peaks at b=9; SC's whole-tree kernel
# handles n<=512 separately so the hybrid SC cap matters only for n>=1024
SCL_PALLAS_B_CAP = 9
SC_PALLAS_B_CAP = 9
# L>8 blocked kernels run code-specialized (unrolled outer, static frozen
# sets/schedules): measured at n=1024, L=16 b=7 (unrolled outer) does
# 71.4M bit/s vs 20.4M at the old b=6 cap (scan outer, traced kernel) —
# the shallow-depth scan outer was the bottleneck. The auto rule picks
# b >= S - log2(UNROLL_OUTER_MAX_M) so the outer sweep unrolls. (The
# traced blocked kernel also hit remote-compile-helper HTTP 500s in r4;
# those proved TRANSIENT service failures, but the perf argument stands.)
BLOCKED_B_CAP = 8
XLA_DEFAULT_B = 5


def resolve_lower_stages(S: int, bs: int, use_pallas: bool,
                         L: int | None = None) -> int:
    """Auto subtree depth for the hybrid sweeps (VERDICT r2 task 7).

    Env override first; otherwise on the Pallas path the largest depth b
    whose fused kernel fits the scoped-VMEM budget at some legal batch
    tile (exact accounting, pallas_scl.scl_vmem_bytes), capped at the
    measured throughput sweet spot; plain-XLA engines default to 5."""
    env = os.environ.get("POLAR_TPU_LOWER_STAGES")
    if env is not None:
        return min(int(env), S - 1)
    if not use_pallas:
        return min(XLA_DEFAULT_B, S - 1)
    from polar_tpu.models.polar import pallas_scl as pk
    cap = SC_PALLAS_B_CAP if L is None else SCL_PALLAS_B_CAP
    floor = 1
    if L is not None and L > 8:
        # blocked kernels (L=16/32) must run code-specialized — the traced
        # blocked kernel crashes the remote compile helper (see
        # BLOCKED_B_CAP note) — so the outer sweep must unroll:
        # m = 2^(S-b) <= UNROLL_OUTER_MAX_M. Returns 0 when no such depth
        # fits VMEM (callers fall back to the XLA engine).
        cap = min(cap, BLOCKED_B_CAP)
        floor = max(1, S - int(np.log2(UNROLL_OUTER_MAX_M)))
    vlim = pk._vmem_limit_override()  # POLAR_TPU_VMEM_LIMIT_MIB, if set
    # cond-leaves (POLAR_TPU_COND_KERNEL=1) only engages on the TRACED
    # kernel, whose ~2.2x scf.if stack spill must then be budgeted. The
    # traced kernel runs when forced by env or when the outer sweep is a
    # lax.scan (m = 2^(S-b) > UNROLL_OUTER_MAX_M — static frozen sets
    # cannot ride scan carries); the unrolled/static outer never executes
    # the cond body, so budgeting it there would under-pick b (ADVICE r3)
    cond_env = (L is not None and L <= 8 and pk.cond_leaves_default())
    force_traced = os.environ.get("POLAR_TPU_TRACED_KERNEL") == "1"
    # L <= 8 (and SC): deepest fitting subtree wins (measured b=9 sweet
    # spot). L > 8: SHALLOWEST depth with an unrolled outer wins — deeper
    # blocked kernels explode Mosaic compile time (b=8 blocked L=16
    # measured >35 min vs ~7 min at b=7 for no runtime win worth it).
    bees = (range(min(cap, S - 1), floor - 1, -1) if floor == 1
            else range(floor, min(cap, S - 1) + 1))
    for b in bees:
        cond = cond_env and (force_traced
                             or (1 << (S - b)) > UNROLL_OUTER_MAX_M)
        # SC budgets 2.2x for the Mosaic stack spill (see sc_subtree_pallas)
        bytes_fn = ((lambda t: int(2.2 * pk.sc_vmem_bytes(b, t)))
                    if L is None
                    else (lambda t, c=cond: pk.scl_vmem_bytes(b, L, t,
                                                              cond=c)))
        try:
            pk.fit_tile(bs, bytes_fn, vmem_limit=vlim)
            return b
        except ValueError:
            continue
    return 0 if floor > 1 else 1

# with at most this many super-leaves the outer sweep unrolls fully
# (no lax.scan/lax.switch) — bigger m keeps the O(log^2 n) scan program
UNROLL_OUTER_MAX_M = 8


def _super_schedule(m: int, top: int):
    """(descent_id, rise_id) for m super-leaves; descent branch t = g-entry
    t stages above the subtree root (t=top means the all-f root descent),
    rise branch r = number of upward combines after the subtree."""
    desc = np.array([top] + [_ctz(j) for j in range(1, m)], dtype=np.int32)
    rise = np.array([_cto(j) for j in range(m)], dtype=np.int32)
    return desc, rise


def sc_sweep_hybrid(llr_ch, frozen_mask, mode: str = "minsum",
                    llr_max: float = 30.0,
                    lower_stages: int = DEFAULT_LOWER_STAGES,
                    use_pallas=None):
    """Two-level SC sweep; bit-identical to ``sc_sweep``. ``llr_ch``:
    [n, bs] true LLRs -> decisions ``u`` [n, bs] int8.

    The per-super-leaf emissions are *stage-b* partial sums (the subtree's
    own codeword), so the decisions come from a width-2^b transform per
    block — the full-width codeword is never materialized."""
    n, bs = llr_ch.shape
    S = int(np.log2(n))
    if use_pallas is None:
        use_pallas = (jax.default_backend() not in ("cpu",)
                      and bs % 128 == 0)
    b = (resolve_lower_stages(S, bs, use_pallas)
         if lower_stages is None else min(int(lower_stages), S - 1))
    if b < 1:
        return sc_sweep(llr_ch, frozen_mask, mode, llr_max)
    f = F_FUNCTIONS[mode]
    w_sub = 1 << b
    m = n >> b
    top = S - b  # number of upper stages
    desc_ids, rise_ids = _super_schedule(m, top)
    frozen = np.asarray(frozen_mask).reshape(m, w_sub)

    # carry: lb stages b+1..S-1 (top-1 arrays), u0 stages b..S-1 (top arrays)
    def lb_shape(t):  # t in 0..top-2 <-> stage b+1+t
        return (1 << (b + 1 + t), bs)

    def u0_shape(t):  # t in 0..top-1 <-> stage b+t
        return (1 << (b + t), bs)

    N_LB = top - 1

    def build_descent(t):
        def branch(carry):
            lbs, u0s = list(carry[:N_LB]), carry[N_LB:]
            s_top = b + t + 1
            a = llr_ch if s_top == S else lbs[t]
            h = 1 << (b + t)
            cur = g_op(a[:h], a[h:], u0s[t])
            if t >= 1:
                lbs[t - 1] = cur  # stage b+t stored for future g-reads
            for s in range(b + t, b, -1):
                h2 = 1 << (s - 1)
                cur = f(cur[:h2], cur[h2:], llr_max)
                if s - 1 > b:
                    lbs[s - 2 - b] = cur
            return tuple(lbs) + u0s, cur
        return branch

    def root_descent(carry):
        lbs, u0s = list(carry[:N_LB]), carry[N_LB:]
        cur = llr_ch
        for s in range(S, b, -1):
            h2 = 1 << (s - 1)
            cur = f(cur[:h2], cur[h2:], llr_max)
            if s - 1 > b:
                lbs[s - 2 - b] = cur
        return tuple(lbs) + u0s, cur

    descent_branches = [build_descent(t) for t in range(top)] + \
        [root_descent]

    def build_rise(r):
        def branch(carry_cw):
            carry, cwj = carry_cw[:-1], carry_cw[-1]
            lbs, u0s = carry[:N_LB], list(carry[N_LB:])
            cur = cwj
            for t in range(r):
                cur = jnp.concatenate([u0s[t] ^ cur, cur], axis=0)
            if r < top:
                u0s[r] = cur
            return lbs + tuple(u0s) + (cwj,)
        return branch

    rise_branches = [build_rise(r) for r in range(top + 1)]

    def subtree(a, frz):
        """Unrolled SC decode of one width-2^b subtree. ``a``: [2^b, bs]
        LLRs; ``frz``: [2^b] traced bools. Returns codeword [2^b, bs]."""
        def node(s, lo, av):
            if s == 0:
                return jnp.where(frz[lo],
                                 jnp.zeros_like(av, dtype=jnp.int8),
                                 (av <= 0).astype(jnp.int8))
            h = 1 << (s - 1)
            u_l = node(s - 1, lo, f(av[:h], av[h:], llr_max))
            u_r = node(s - 1, lo + h, g_op(av[:h], av[h:], u_l))
            return jnp.concatenate([u_l ^ u_r, u_r], axis=0)
        return node(b, 0, a)

    def run_subtree(a, frz):
        if use_pallas:
            from polar_tpu.models.polar.pallas_scl import sc_subtree_pallas
            interp = jax.default_backend() == "cpu"
            if isinstance(frz, np.ndarray):
                # static frozen set (unrolled outer): rate-0-pruned
                # schedule, bit-identical to the plain sweep
                return sc_subtree_pallas(
                    a, None, b=b, llr_max=float(llr_max), mode=mode,
                    interpret=interp,
                    sched_static=tuple(fast_schedule(frz, rep=False))
                ).astype(jnp.int8)
            return sc_subtree_pallas(
                a, jnp.asarray(frz).astype(jnp.int32), b=b,
                llr_max=float(llr_max), mode=mode,
                interpret=interp).astype(jnp.int8)
        return subtree(a, frz)

    def body(carry, x):
        desc_id, rise_id, frz = x
        carry, a = lax.switch(desc_id, descent_branches, carry)
        cwj = run_subtree(a, frz)
        carry = lax.switch(rise_id, rise_branches, carry + (cwj,))[:-1]
        return carry, cwj

    pv = lambda x: _pvary_like(x, llr_ch)
    lbs0 = tuple(pv(jnp.zeros(lb_shape(t), jnp.float32))
                 for t in range(N_LB))
    u0s0 = tuple(pv(jnp.zeros(u0_shape(t), jnp.int8)) for t in range(top))
    if m <= UNROLL_OUTER_MAX_M:
        # unrolled outer (no scan/switch) — see scl_sweep_hybrid; the
        # branch indices become static so XLA specializes per super-leaf
        carry = lbs0 + u0s0
        cws_l = []
        for j in range(m):
            carry, a = descent_branches[int(desc_ids[j])](carry)
            cwj = run_subtree(a, frozen[j])
            carry = rise_branches[int(rise_ids[j])](carry + (cwj,))[:-1]
            cws_l.append(cwj)
        cws = jnp.stack(cws_l, axis=0)
    else:
        _, cws = lax.scan(body, lbs0 + u0s0,
                          (jnp.asarray(desc_ids), jnp.asarray(rise_ids),
                           jnp.asarray(frozen)))
    u = polar_transform(cws, axis=1)  # [m, 2^b, bs]: per-subtree involution
    return u.reshape(n, bs)


def scl_sweep_hybrid(llr_ch, frozen_mask, list_size: int,
                     mode: str = "minsum", llr_max: float = 30.0,
                     lower_stages: int = DEFAULT_LOWER_STAGES,
                     use_pallas=None):
    """Two-level SCL sweep; bit-identical to ``scl_sweep`` (same candidate
    ordering, PM updates, and top_k tie behavior). Returns ``(u [n, L, bs]
    int8, pm [L, bs])`` like ``scl_sweep``.

    Fork bookkeeping: path pointers for the *upper* stages (as in
    ``scl_sweep``); *local* subtree values are permuted directly (they are
    small and live in registers/VMEM). The final codeword is stitched from
    per-super-leaf emissions ``cw_j`` using the per-super-leaf parent-map
    compositions ``P_j`` (survivor backtracking across scan steps), so no
    O(n·L·bs) codeword buffer rides the carry.
    """
    n, bs = llr_ch.shape
    S = int(np.log2(n))
    L = int(list_size)
    if use_pallas is None:
        # the fused kernel pays off on real TPUs; CPU tests exercise it
        # explicitly via interpret mode. Lane-align the batch tile; L=8
        # rides one 8-sublane f32 tile; L=16/32 use the blocked kernel
        # (pallas_scl._subtree_kernel_blocked, lists of (8, TB) blocks, no
        # lane-width cap), equality-tested in the TPU lane.
        use_pallas = (jax.default_backend() not in ("cpu",)
                      and bs % 128 == 0 and L in (8, 16, 32))
    b = (resolve_lower_stages(S, bs, use_pallas, L=L)
         if lower_stages is None else min(int(lower_stages), S - 1))
    if b == 0 and use_pallas and L > 8:
        # no VMEM-legal unrolled-outer depth for the blocked kernel (see
        # BLOCKED_B_CAP): run the plain-XLA hybrid instead
        use_pallas = False
        b = resolve_lower_stages(S, bs, False, L=L)
    if b < 1:
        return scl_sweep(llr_ch, frozen_mask, L, mode, llr_max)
    f = F_FUNCTIONS[mode]
    w_sub = 1 << b
    m = n >> b
    top = S - b
    desc_ids, rise_ids = _super_schedule(m, top)
    frozen = np.asarray(frozen_mask).reshape(m, w_sub)
    llr_bc = jnp.broadcast_to(llr_ch[:, None, :], (n, L, bs))
    ident = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[:, None],
                             (L, bs))
    clip = lambda x: jnp.clip(x, -llr_max, llr_max)

    # carry: lb stages b+1..S-1 (N_LB arrays), u0 stages b..S-1 (top
    # arrays), lperm [N_LB, L, bs], uperm [top, L, bs], pm [L, bs]
    N_LB = top - 1
    I_LP, I_UP, I_PM = N_LB + top, N_LB + top + 1, N_LB + top + 2

    def read(seg, perm_row):
        return jnp.take_along_axis(seg, perm_row[None], axis=1)

    def build_descent(t):
        def branch(carry):
            lbs = list(carry[:N_LB])
            u0s = carry[N_LB:N_LB + top]
            lperm, uperm = carry[I_LP], carry[I_UP]
            s_top = b + t + 1
            a = (llr_bc if s_top == S
                 else read(lbs[t], lperm[t]))
            h = 1 << (b + t)
            left = read(u0s[t], uperm[t])
            cur = g_op(a[:h], a[h:], left)
            if t >= 1:
                lbs[t - 1] = cur
            for s in range(b + t, b, -1):
                h2 = 1 << (s - 1)
                cur = f(cur[:h2], cur[h2:], llr_max)
                if s - 1 > b:
                    lbs[s - 2 - b] = cur
            if t >= 1:
                lperm = lperm.at[0:t].set(ident)
            out = tuple(lbs) + carry[N_LB:I_LP] + (lperm,) + carry[I_UP:]
            return out, cur
        return branch

    def root_descent(carry):
        lbs = list(carry[:N_LB])
        cur = llr_bc
        for s in range(S, b, -1):
            h2 = 1 << (s - 1)
            cur = f(cur[:h2], cur[h2:], llr_max)
            if s - 1 > b:
                lbs[s - 2 - b] = cur
        lperm = (carry[I_LP].at[:].set(ident) if N_LB else carry[I_LP])
        out = tuple(lbs) + carry[N_LB:I_LP] + (lperm,) + carry[I_UP:]
        return out, cur

    # (root_descent only runs at super-leaf 0, where all perms are identity
    # anyway — the .set(ident) keeps the pytree write-set uniform)

    descent_branches = [build_descent(t) for t in range(top)] + \
        [root_descent]

    def build_rise(r):
        def branch(carry_cw):
            carry, cwj = carry_cw[:-1], carry_cw[-1]
            u0s = list(carry[N_LB:N_LB + top])
            uperm = carry[I_UP]
            cur = cwj
            for t in range(r):
                left = read(u0s[t], uperm[t])
                cur = jnp.concatenate([left ^ cur, cur], axis=0)
            if r < top:
                u0s[r] = cur
                uperm = uperm.at[r].set(ident)
            out = (carry[:N_LB] + tuple(u0s) + (carry[I_LP], uperm)
                   + carry[I_PM:])
            return out + (cwj,)
        return branch

    rise_branches = [build_rise(r) for r in range(top + 1)]

    def subtree(a, frz, lperm, uperm, pm):
        """Unrolled width-2^b SCL subtree. Returns
        (cw_j [2^b, L, bs], P_j [L, bs], lperm, uperm, pm).

        Dispatch-optimized (every XLA op costs ~5 us of launch overhead on
        this backend, so op COUNT per leaf is the figure of merit):

        * all live local segments sit in ONE packed f32 buffer ``lloc`` and
          ONE packed int8 buffer ``uloc`` (stage s at offset 2^s - 1), so a
          fork permutes paths with exactly 3 gathers (lloc, uloc, and the
          perm/P pack) instead of one gather per live segment;
        * the frozen/info distinction is BRANCHLESS: the fork candidates
          and top_k are computed unconditionally and the results selected
          with ``where`` — a TPU conditional costs far more than the wasted
          top_k, and the selected values are bit-identical to the cond
          version (frozen leaves select pm+softplus(-v), identity parents,
          zero bits).
        """
        W = (1 << (b + 1)) - 1
        off = lambda s: (1 << s) - 1
        P = ident  # parent-map composition; upper perms are re-indexed by
        # it ONCE at the end (they are never read inside the subtree)
        lloc = jnp.zeros((W, L, bs), jnp.float32)
        lloc = lloc.at[off(b):off(b + 1)].set(a)
        uloc = jnp.zeros((W, L, bs), jnp.int8)
        _, dsub, rsub = leaf_schedule(w_sub)
        zeros_bit = jnp.zeros((1, L, bs), jnp.int8)
        cwj = None
        for i in range(w_sub):
            d, r = int(dsub[i]), int(rsub[i])
            # descent: g-entry at stage d (or all-f root for leaf 0)
            if i == 0:
                cur = a
                for s in range(b, 0, -1):
                    h = 1 << (s - 1)
                    cur = f(cur[:h], cur[h:], llr_max)
                    lloc = lloc.at[off(s - 1):off(s)].set(cur)
            else:
                aseg = lloc[off(d + 1):off(d + 2)]
                h = 1 << d
                cur = g_op(aseg[:h], aseg[h:], uloc[off(d):off(d + 1)])
                lloc = lloc.at[off(d):off(d + 1)].set(cur)
                for s in range(d, 0, -1):
                    h = 1 << (s - 1)
                    cur = f(cur[:h], cur[h:], llr_max)
                    lloc = lloc.at[off(s - 1):off(s)].set(cur)
            # branchless leaf fork
            v = clip(cur[0])  # stage-0 LLR [L, bs]
            sp_n = _softplus(-v)
            pmc = jnp.concatenate([pm + sp_n, pm + _softplus(v)], axis=0)
            neg_vals, idxk = lax.top_k(-pmc.T, L)  # [bs, L]
            frz_i = frz[i]
            pm = jnp.where(frz_i, pm + sp_n, (-neg_vals).T)
            parent = jnp.where(frz_i, ident, (idxk % L).T.astype(jnp.int32))
            ubit = jnp.where(frz_i, zeros_bit,
                             (idxk // L).T.astype(jnp.int8)[None])
            p3 = parent[None]
            lloc = jnp.take_along_axis(lloc, p3, axis=1)
            uloc = jnp.take_along_axis(uloc, p3, axis=1)
            P = jnp.take_along_axis(P, parent, axis=0)
            # rise: combine partial sums upward through cto(i) stages
            cur_u = ubit
            for s in range(min(r, b)):
                left = uloc[off(s):off(s + 1)]
                cur_u = jnp.concatenate([left ^ cur_u, cur_u], axis=0)
            if r >= b:
                cwj = cur_u  # width 2^b: the subtree codeword (last leaf)
            else:
                uloc = uloc.at[off(r):off(r + 1)].set(cur_u)
        P3 = P[None]
        lperm = jnp.take_along_axis(lperm, P3, axis=1) if N_LB else lperm
        uperm = jnp.take_along_axis(uperm, P3, axis=1)
        return (cwj, P, lperm, uperm, pm)

    def run_subtree(carry, a, frz):
        """frz may be a traced array (scan path) or static numpy (unrolled
        outer) — static frozen sets compile a code-specialized kernel
        where frozen leaves cost only a pm update (pallas_scl).

        ``POLAR_TPU_TRACED_KERNEL=1`` forces the traced (frz-in-SMEM)
        kernel even on the unrolled outer: one generic executable instead
        of a per-frozen-set specialization. Bit-identical but ~30% slower;
        its Mosaic compile is minutes faster cold, which is what a
        compile-time-budgeted cold environment (the driver bench) needs.
        Ignored for L > 8: the traced BLOCKED kernel crashes the remote
        compile helper (see BLOCKED_B_CAP note)."""
        force_traced = (os.environ.get("POLAR_TPU_TRACED_KERNEL") == "1"
                        and L <= 8)
        if use_pallas:
            from polar_tpu.models.polar.pallas_scl import subtree_pallas
            interp = jax.default_backend() == "cpu"
            if isinstance(frz, np.ndarray) and not force_traced:
                cw32, Pj, pm = subtree_pallas(
                    a, None, carry[I_PM], b=b, L=L, llr_max=float(llr_max),
                    mode=mode, interpret=interp,
                    frz_static=tuple(int(x) for x in frz))
            else:
                from polar_tpu.models.polar.pallas_scl import (
                    cond_leaves_default)
                cw32, Pj, pm = subtree_pallas(
                    a, jnp.asarray(frz).astype(jnp.int32), carry[I_PM],
                    b=b, L=L, llr_max=float(llr_max), mode=mode,
                    interpret=interp, cond_leaves=cond_leaves_default())
            cwj = cw32.astype(jnp.int8)
            P3 = Pj[None]
            lperm = (jnp.take_along_axis(carry[I_LP], P3, axis=1)
                     if N_LB else carry[I_LP])
            uperm = jnp.take_along_axis(carry[I_UP], P3, axis=1)
        else:
            cwj, Pj, lperm, uperm, pm = subtree(
                a, frz, carry[I_LP], carry[I_UP], carry[I_PM])
        return carry[:I_LP] + (lperm, uperm, pm), cwj, Pj

    def body(carry, x):
        desc_id, rise_id, frz = x
        carry, a = lax.switch(desc_id, descent_branches, carry)
        carry, cwj, Pj = run_subtree(carry, a, frz)
        carry = lax.switch(rise_id, rise_branches, carry + (cwj,))[:-1]
        return carry, (cwj, Pj)

    pv = lambda x: _pvary_like(x, llr_ch)
    lbs0 = tuple(pv(jnp.zeros((1 << (b + 1 + t), L, bs), jnp.float32))
                 for t in range(N_LB))
    u0s0 = tuple(pv(jnp.zeros((1 << (b + t), L, bs), jnp.int8))
                 for t in range(top))
    lperm0 = pv(jnp.broadcast_to(ident[None],
                                 (N_LB, L, bs)).astype(jnp.int32)
                if N_LB else jnp.zeros((0, L, bs), jnp.int32))
    uperm0 = pv(jnp.broadcast_to(ident[None], (top, L, bs))
                .astype(jnp.int32))
    pm0 = pv(jnp.full((L, bs), llr_max, jnp.float32).at[0].set(0.0))
    carry = lbs0 + u0s0 + (lperm0, uperm0, pm0)

    if m <= UNROLL_OUTER_MAX_M:
        # few super-leaves: unroll the outer loop entirely — no lax.scan,
        # no lax.switch (each super-leaf's descent/rise branch is a static
        # Python index, so XLA specializes and fuses per super-leaf and
        # dead carry writes are eliminated). Bit-identical to the scan
        # path; measured ~25% faster full-chain at n=1024, b=8, bs=8192.
        cws_l, ps_l = [], []
        for j in range(m):
            carry, a = descent_branches[int(desc_ids[j])](carry)
            carry, cwj, Pj = run_subtree(carry, a, frozen[j])
            carry = rise_branches[int(rise_ids[j])](carry + (cwj,))[:-1]
            cws_l.append(cwj)
            ps_l.append(Pj)
        pm = carry[I_PM]
        # unrolled survivor backtracking
        label = ident
        cw_parts = [None] * m
        for j in range(m - 1, -1, -1):
            cw_parts[j] = jnp.take_along_axis(cws_l[j], label[None], axis=1)
            label = jnp.take_along_axis(ps_l[j], label, axis=0)
        cw = jnp.stack(cw_parts, axis=0)  # [m, 2^b, L, bs]
        u = polar_transform(cw, axis=1)
        return u.reshape(n, L, bs), pm

    carry, (cws, Ps) = lax.scan(
        body, carry,
        (jnp.asarray(desc_ids), jnp.asarray(rise_ids),
         jnp.asarray(frozen)))
    pm = carry[I_PM]

    # survivor backtracking: label_j maps final path slots to the logical
    # slots at the end of super-leaf j; label_{j-1} = P_j[label_j]
    def back(label, Pj):
        prev = jnp.take_along_axis(Pj, label, axis=0)
        return prev, label

    _, labels = lax.scan(back, pv(ident), Ps, reverse=True)  # [m, L, bs]
    cw = jnp.take_along_axis(cws, labels[:, None], axis=2)  # [m, 2^b, L, bs]
    u = polar_transform(cw, axis=1)  # per-subtree involution -> decisions
    return u.reshape(n, L, bs), pm


# ----------------------------------------------------------------------
# Fast-SCL hybrid sweep (Hashemi rate-0 / repetition pruning)
# ----------------------------------------------------------------------
# Bit-identical to the unrolled engine with use_fast_scl=True (the
# reference default, my_sn/fec/polar/dec.py:264-307 via scl.py _node):
# the global pruned schedule is split at the subtree boundary —
# sub-subtree nodes run inside the fused kernel (pallas_scl sched_static)
# or the XLA mirror below; nodes spanning whole subtrees (upper rate-0 /
# repetition) are handled here at their true stage, with the repetition
# fork's parent map attached to the FIRST covered subtree so survivor
# backtracking reads the covered emissions in post-fork order.
# The outer sweep is always unrolled (the schedule is static anyway);
# program size is O(#pruned-ops), between O(log^2 n) and O(n).

_STALE = "stale"  # dead pointer marker (rewritten before next read)


def resolve_fast_lower_stages(S: int, bs: int, use_pallas: bool, L: int,
                              lower_stages: int | None = None) -> int:
    """Subtree depth for the FAST (Hashemi-pruned) sweep.

    Unlike the plain hybrid/SC sweeps, the fast sweep supports b = S
    (whole-tree: m = 1, top = 0 — every upper-stage list is empty and the
    single unit covers the tree), so both the explicit ``lower_stages``
    argument and the ``POLAR_TPU_LOWER_STAGES`` env override clamp to S
    here. ``resolve_lower_stages`` keeps its S-1 clamp for the plain
    paths, whose scan-ready carry layouts assume top >= 1 (ADVICE r4:
    the env used to funnel through that clamp, so the whole-tree config
    was unreachable from bench.py/profile_chain.py at n = 1024).

    Auto (no override) prefers the whole tree for S <= 9 when its kernel
    fits scoped VMEM (n <= 512 at the 16 MiB default: one kernel per
    decode, no upper XLA traffic, cold compile <= ~2 min). At n = 1024
    the whole tree is env-reachable but NOT preferred: measured 274.0M
    bit/s vs 322-331M for b=9 under a 32 MiB limit (r5, bs=8192) — the
    monolithic kernel's 16 MiB footprint pins TB=128 while b=9 gets
    TB=256, and tile width beats dispatch count there."""
    if lower_stages is not None:
        return min(int(lower_stages), S)
    env = os.environ.get("POLAR_TPU_LOWER_STAGES")
    if env is not None:
        return min(int(env), S)
    if use_pallas and L <= 8 and S <= 9:
        from polar_tpu.models.polar import pallas_scl as pk
        try:
            pk.fit_tile(bs, lambda t: pk.scl_vmem_bytes(S, L, t),
                        vmem_limit=pk._vmem_limit_override())
            return S
        except ValueError:
            pass
    return resolve_lower_stages(S, bs, use_pallas, L=L)


def scl_sweep_hybrid_fast(llr_ch, frozen_mask, list_size: int,
                          mode: str = "minsum", llr_max: float = 30.0,
                          lower_stages: int = DEFAULT_LOWER_STAGES,
                          use_pallas=None, rate1: bool = False):
    """Two-level fast-SCL sweep. Same contract as ``scl_sweep_hybrid``
    (returns ``(u [n, L, bs] int8, pm [L, bs])``), but runs the Hashemi
    rate-0/repetition pruned node schedule — bit-identical to
    ``PolarSCLDecoder(schedule='unrolled', use_fast_scl=True)``.

    ``rate1=True`` additionally prunes all-info nodes (theta sequential
    least-reliable-flip forks at the node top; see scl.py _rate1_node) —
    bit-identical to the unrolled engine with ``fast_rate1=True``. Nodes
    spanning whole subtrees are handled at their true stage in the outer
    sweep, so the contract holds for any subtree depth ``b``."""
    n, bs = llr_ch.shape
    S = int(np.log2(n))
    L = int(list_size)
    if use_pallas is None:
        use_pallas = (jax.default_backend() not in ("cpu",)
                      and bs % 128 == 0 and L in (8, 16, 32))
    b = resolve_fast_lower_stages(S, bs, use_pallas, L,
                                  lower_stages=lower_stages)
    if b == 0 and use_pallas and L > 8:
        # see scl_sweep_hybrid: blocked kernels need the unrolled outer
        use_pallas = False
        b = resolve_lower_stages(S, bs, False, L=L)
    b = max(1, b)
    f = F_FUNCTIONS[mode]
    w_sub = 1 << b
    m = n >> b
    top = S - b
    N_LB = top - 1
    mask = np.asarray(frozen_mask, dtype=bool)
    units, _ = split_fast_schedule(mask, b, rate1=rate1)
    llr_bc = jnp.broadcast_to(llr_ch[:, None, :], (n, L, bs))
    ident = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[:, None],
                             (L, bs))
    clip = lambda x: jnp.clip(x, -llr_max, llr_max)

    # upper-stage state: per-stage buffers + per-stage path pointers with
    # host-tracked identity (None) / dead (_STALE) markers, exactly the
    # fused kernel's bookkeeping lifted to the XLA level.
    lbs = [jnp.zeros((1 << (b + 1 + t), L, bs), jnp.float32)
           for t in range(N_LB)]          # super-stage t+1 (real b+1+t)
    u0s = [jnp.zeros((1 << (b + t), L, bs), jnp.int8)
           for t in range(top)]           # super-stage t (real b+t)
    lptr = [None] * N_LB
    uptr = [None] * top
    pm = jnp.full((L, bs), llr_max, jnp.float32).at[0].set(0.0)

    def read(seg, ptr):
        assert ptr is not _STALE, "read of dead upper stage"
        if ptr is None:
            return seg
        return jnp.take_along_axis(seg, ptr[None], axis=1)

    def compose(ptr, parent):
        if ptr is None:
            return parent
        return jnp.take_along_axis(ptr, parent, axis=0)

    def compose_live(parent, j_end: int, sg_nd: int):
        """Re-index live upper pointers by the fork's parent selection.
        lbs[t] (super-stage t+1) is live iff bit_t(j_end) == 0 (its g-read
        is pending); u0s[t] iff bit_t(j_end) == 1 and t >= sg_nd (combine
        pending at or above the node root) — the unrolled engine's
        ``min_stage`` liveness (scl.py _fork)."""
        for t in range(N_LB):
            lptr[t] = (compose(lptr[t], parent)
                       if ((j_end >> t) & 1) == 0 else _STALE)
        for t in range(top):
            uptr[t] = (compose(uptr[t], parent)
                       if t >= sg_nd and ((j_end >> t) & 1) == 1
                       else _STALE)

    def descend(j0: int, sg_nd: int):
        """LLR descent for the unit starting at super-leaf ``j0``, stopping
        at super-stage ``sg_nd`` (real stage b + sg_nd). Returns the node
        segment [2^(b+sg_nd), L, bs]; stores pass-through stages."""
        if j0 == 0:
            cur = llr_bc
            for sg in range(top, sg_nd, -1):   # real stage b+sg -> b+sg-1
                h = 1 << (b + sg - 1)
                cur = f(cur[:h], cur[h:], llr_max)
                if sg - 1 > sg_nd:
                    lbs[sg - 2] = cur
                    lptr[sg - 2] = None
                elif sg - 1 >= 1:
                    lptr[sg - 2] = _STALE
            return cur
        d = _ctz(j0)
        a = llr_bc if d + 1 == top else read(lbs[d], lptr[d])
        h = 1 << (b + d)
        cur = g_op(a[:h], a[h:], read(u0s[d], uptr[d]))
        if d > sg_nd:
            lbs[d - 1] = cur
            lptr[d - 1] = None
        elif d >= 1:
            lptr[d - 1] = _STALE
        for sg in range(d, sg_nd, -1):
            h = 1 << (b + sg - 1)
            cur = f(cur[:h], cur[h:], llr_max)
            if sg - 1 > sg_nd:
                lbs[sg - 2] = cur
                lptr[sg - 2] = None
            elif sg - 1 >= 1:
                lptr[sg - 2] = _STALE
        return cur

    def rise(node_sums, j_end: int, sg_nd: int):
        """Combine partial sums upward from super-stage ``sg_nd`` through
        cto(j_end) super-stages; store the result for the pending g-read."""
        r = _cto(j_end)
        cur_u = node_sums
        for sg in range(sg_nd, min(r, top)):
            left = read(u0s[sg], uptr[sg])
            cur_u = jnp.concatenate([left ^ cur_u, cur_u], axis=0)
        if r < top:
            u0s[r] = cur_u
            uptr[r] = None

    def run_subtree(a, sched):
        """One pruned subtree: fused kernel (sched_static) or XLA mirror.
        Returns (cw_j [2^b, L, bs] int8, P_j [L, bs] int32 or None)."""
        nonlocal pm
        if use_pallas:
            from polar_tpu.models.polar.pallas_scl import subtree_pallas
            interp = jax.default_backend() == "cpu"
            cw32, Pj, pm_new = subtree_pallas(
                a, None, pm, b=b, L=L, llr_max=float(llr_max), mode=mode,
                interpret=interp, sched_static=tuple(sched))
            pm = pm_new
            return cw32.astype(jnp.int8), Pj
        return _subtree_fast_xla(a, sched)

    def _subtree_fast_xla(a, sched):
        """XLA mirror of the pruned subtree kernel: packed local buffers,
        whole-buffer fork gathers (the stage-b input rides the packed
        buffer so fork permutes reach it), Hashemi z/r shortcuts."""
        nonlocal pm
        W = (1 << (b + 1)) - 1
        off = lambda s: (1 << s) - 1
        P = None
        lloc = jnp.zeros((W, L, bs), jnp.float32)
        lloc = lloc.at[off(b):off(b + 1)].set(a)
        uloc = jnp.zeros((W, L, bs), jnp.int8)
        cwj = None
        for kind, s_nd, lo in sched:
            w_nd = 1 << s_nd
            i_end = lo + w_nd - 1
            # descent to the node root
            if lo == 0:
                cur = lloc[off(b):off(b + 1)]
                for s in range(b, s_nd, -1):
                    h = 1 << (s - 1)
                    cur = f(cur[:h], cur[h:], llr_max)
                    if s - 1 > s_nd:
                        lloc = lloc.at[off(s - 1):off(s)].set(cur)
            else:
                d = _ctz(lo)
                seg = lloc[off(d + 1):off(d + 2)]
                h = 1 << d
                cur = g_op(seg[:h], seg[h:], uloc[off(d):off(d + 1)])
                if d > s_nd:
                    lloc = lloc.at[off(d):off(d + 1)].set(cur)
                for s in range(d, s_nd, -1):
                    h = 1 << (s - 1)
                    cur = f(cur[:h], cur[h:], llr_max)
                    if s - 1 > s_nd:
                        lloc = lloc.at[off(s - 1):off(s)].set(cur)
            # node
            if kind == "f":
                pm = pm + _softplus(-clip(cur[0]))
                ubit = jnp.zeros((1, L, bs), jnp.int8)
            elif kind == "z":
                pm = pm + jnp.sum(_softplus(-clip(cur)), axis=0)
                ubit = jnp.zeros((w_nd, L, bs), jnp.int8)
            elif kind == "o":
                # rate-1 node: hard-decision base PM + theta sequential
                # least-reliable-flip forks (scl.py _rate1_node semantics;
                # theta == w -> ROW-order forks, no reliability sort)
                a_c = clip(cur)
                aab = jnp.abs(a_c)
                pm = pm + jnp.sum(_softplus(-aab), axis=0)
                hd = (a_c < 0).astype(jnp.int8)
                theta = min(L - 1, w_nd)
                small = w_nd <= L - 1
                if not small:
                    negv, rows = lax.top_k(jnp.moveaxis(-aab, 0, -1),
                                           theta)
                    vals = -negv                      # [L, bs, theta]
                qn = None
                fm = jnp.zeros((w_nd, L, bs), jnp.int8)
                iota_w = jnp.arange(w_nd, dtype=jnp.int32)[:, None, None]
                for t in range(theta):
                    val_t = aab[t] if small else vals[:, :, t]
                    if qn is not None:
                        val_t = jnp.take_along_axis(val_t, qn, axis=0)
                    pmc = jnp.concatenate([pm, pm + val_t], axis=0)
                    neg_vals, idxk = lax.top_k(-pmc.T, L)
                    pm = (-neg_vals).T
                    parent = (idxk % L).T.astype(jnp.int32)
                    flip = (idxk // L).T.astype(jnp.int8)
                    p3 = parent[None]
                    lloc = jnp.take_along_axis(lloc, p3, axis=1)
                    uloc = jnp.take_along_axis(uloc, p3, axis=1)
                    P = parent if P is None \
                        else jnp.take_along_axis(P, parent, axis=0)
                    qn = (parent if qn is None
                          else jnp.take_along_axis(qn, parent, axis=0))
                    fm = jnp.take_along_axis(fm, p3, axis=1)
                    if small:
                        fm = fm ^ jnp.where(iota_w == t, flip[None],
                                            jnp.int8(0))
                    else:
                        row_t = jnp.take_along_axis(
                            rows[:, :, t].astype(jnp.int32), qn, axis=0)
                        fm = fm ^ jnp.where(
                            (iota_w == row_t[None]) & (flip[None] == 1),
                            jnp.int8(1), jnp.int8(0))
                c = (hd if qn is None
                     else jnp.take_along_axis(hd, qn[None], axis=1))
                ubit = c ^ fm
            elif kind == "s":
                # SPC node: parity-tracked flip forks (scl.py _spc_node)
                a_c = clip(cur)
                aab = jnp.abs(a_c)
                hd = (a_c < 0).astype(jnp.int8)
                par = jnp.bitwise_and(
                    jnp.sum(hd.astype(jnp.int32), axis=0), 1)
                theta = min(L, w_nd)
                negv, rows = lax.top_k(jnp.moveaxis(-aab, 0, -1), theta)
                vals = -negv
                v0 = vals[:, :, 0]
                pm = pm + jnp.sum(_softplus(-aab), axis=0) \
                    + par.astype(jnp.float32) * v0
                e = par.astype(jnp.int8)
                qn = None
                fm = jnp.zeros((w_nd, L, bs), jnp.int8)
                iota_w = jnp.arange(w_nd, dtype=jnp.int32)[:, None, None]
                for t in range(1, theta):
                    val_t = vals[:, :, t]
                    v0c = v0
                    if qn is not None:
                        val_t = jnp.take_along_axis(val_t, qn, axis=0)
                        v0c = jnp.take_along_axis(v0, qn, axis=0)
                    pen = val_t + (1.0 - 2.0 * e.astype(jnp.float32)) * v0c
                    pmc = jnp.concatenate([pm, pm + pen], axis=0)
                    neg_vals, idxk = lax.top_k(-pmc.T, L)
                    pm = (-neg_vals).T
                    parent = (idxk % L).T.astype(jnp.int32)
                    flip = (idxk // L).T.astype(jnp.int8)
                    p3 = parent[None]
                    lloc = jnp.take_along_axis(lloc, p3, axis=1)
                    uloc = jnp.take_along_axis(uloc, p3, axis=1)
                    P = parent if P is None \
                        else jnp.take_along_axis(P, parent, axis=0)
                    qn = (parent if qn is None
                          else jnp.take_along_axis(qn, parent, axis=0))
                    fm = jnp.take_along_axis(fm, p3, axis=1)
                    e = jnp.take_along_axis(e, parent, axis=0) ^ flip
                    row_t = jnp.take_along_axis(
                        rows[:, :, t].astype(jnp.int32), qn, axis=0)
                    fm = fm ^ jnp.where(
                        (iota_w == row_t[None]) & (flip[None] == 1),
                        jnp.int8(1), jnp.int8(0))
                row_0 = rows[:, :, 0].astype(jnp.int32)
                if qn is not None:
                    row_0 = jnp.take_along_axis(row_0, qn, axis=0)
                fm = fm ^ jnp.where(
                    (iota_w == row_0[None]) & (e[None] == 1),
                    jnp.int8(1), jnp.int8(0))
                c = (hd if qn is None
                     else jnp.take_along_axis(hd, qn[None], axis=1))
                ubit = c ^ fm
            else:
                if kind == "r":
                    a_c = clip(cur)
                    pmc = jnp.concatenate(
                        [pm + jnp.sum(_softplus(-a_c), axis=0),
                         pm + jnp.sum(_softplus(a_c), axis=0)], axis=0)
                else:  # 'i'
                    v = clip(cur[0])
                    pmc = jnp.concatenate(
                        [pm + _softplus(-v), pm + _softplus(v)], axis=0)
                neg_vals, idxk = lax.top_k(-pmc.T, L)  # [bs, L]
                pm = (-neg_vals).T
                parent = (idxk % L).T.astype(jnp.int32)
                bit = (idxk // L).T.astype(jnp.int8)
                ubit = (bit[None] if s_nd == 0
                        else jnp.broadcast_to(bit[None], (w_nd, L, bs)))
                p3 = parent[None]
                lloc = jnp.take_along_axis(lloc, p3, axis=1)
                uloc = jnp.take_along_axis(uloc, p3, axis=1)
                P = parent if P is None \
                    else jnp.take_along_axis(P, parent, axis=0)
            # rise
            r = _cto(i_end)
            cur_u = ubit
            for s in range(s_nd, min(r, b)):
                left = uloc[off(s):off(s + 1)]
                cur_u = jnp.concatenate([left ^ cur_u, cur_u], axis=0)
            if r >= b:
                cwj = cur_u
            else:
                uloc = uloc.at[off(r):off(r + 1)].set(cur_u)
        return cwj, P

    # ---- the unrolled outer sweep over schedule units ----
    cws_l = [None] * m
    ps_l = [None] * m
    for unit in units:
        if unit[0] == "sub":
            _, j, sched = unit
            a = descend(j, 0)
            cwj, Pj = run_subtree(a, sched)
            if Pj is not None:
                compose_live(Pj, j, 0)
            cws_l[j] = cwj
            ps_l[j] = Pj
            rise(cwj, j, 0)
        else:
            kind, s_real, j0, q = unit
            sg_nd = s_real - b
            j_end = j0 + q - 1
            cur = descend(j0, sg_nd)       # [2^s_real, L, bs]
            if kind == "z":
                # rate-0 spanning q subtrees: bulk pm update (Eq. 26)
                pm = pm + jnp.sum(_softplus(-clip(cur)), axis=0)
                node_sums = jnp.zeros((1 << s_real, L, bs), jnp.int8)
                for jj in range(j0, j_end + 1):
                    cws_l[jj] = jnp.zeros((w_sub, L, bs), jnp.int8)
                    ps_l[jj] = None
            elif kind == "o":
                # rate-1 spanning q subtrees, at its TRUE stage (the
                # unrolled engine prunes maximal nodes, so handling it
                # lower would change the numerics): theta sequential
                # least-reliable-flip forks, each composing the live
                # upper pointers like any other upper fork
                w_nd = 1 << s_real
                a_c = clip(cur)
                aab = jnp.abs(a_c)
                pm = pm + jnp.sum(_softplus(-aab), axis=0)
                hd = (a_c < 0).astype(jnp.int8)
                theta = min(L - 1, w_nd)
                small = w_nd <= L - 1
                if not small:
                    negv, rows = lax.top_k(jnp.moveaxis(-aab, 0, -1),
                                           theta)
                    vals = -negv
                qn = None
                fm = jnp.zeros((w_nd, L, bs), jnp.int8)
                iota_w = jnp.arange(w_nd, dtype=jnp.int32)[:, None, None]
                for t in range(theta):
                    val_t = aab[t] if small else vals[:, :, t]
                    if qn is not None:
                        val_t = jnp.take_along_axis(val_t, qn, axis=0)
                    pmc = jnp.concatenate([pm, pm + val_t], axis=0)
                    neg_vals, idxk = lax.top_k(-pmc.T, L)
                    pm = (-neg_vals).T
                    parent = (idxk % L).T.astype(jnp.int32)
                    flip = (idxk // L).T.astype(jnp.int8)
                    compose_live(parent, j_end, sg_nd)
                    qn = (parent if qn is None
                          else jnp.take_along_axis(qn, parent, axis=0))
                    fm = jnp.take_along_axis(fm, parent[None], axis=1)
                    if small:
                        fm = fm ^ jnp.where(iota_w == t, flip[None],
                                            jnp.int8(0))
                    else:
                        row_t = jnp.take_along_axis(
                            rows[:, :, t].astype(jnp.int32), qn, axis=0)
                        fm = fm ^ jnp.where(
                            (iota_w == row_t[None]) & (flip[None] == 1),
                            jnp.int8(1), jnp.int8(0))
                c = (hd if qn is None
                     else jnp.take_along_axis(hd, qn[None], axis=1)) ^ fm
                node_sums = c
                # per-subtree emissions must be STAGE-b codewords (the
                # final tail per-subtree-transforms them into leaf
                # decisions), so undo the node's upper combine levels:
                # apply the butterfly along the covered-chunk axis. (The
                # upper rep node skips this because its only info leaf is
                # the node's last — broadcast agrees there.)
                em = polar_transform(c.reshape(q, w_sub, L, bs), axis=0)
                for jj in range(j0, j_end + 1):
                    cws_l[jj] = em[jj - j0]
                    # the node's composed parent map rides the FIRST
                    # covered subtree (same rule as the upper rep fork)
                    ps_l[jj] = qn if jj == j0 else None
            elif kind == "s":
                # SPC spanning q subtrees, at its true stage (scl.py
                # _spc_node semantics; upper-pointer composition and
                # chunk emission as for the upper rate-1 node)
                w_nd = 1 << s_real
                a_c = clip(cur)
                aab = jnp.abs(a_c)
                hd = (a_c < 0).astype(jnp.int8)
                par = jnp.bitwise_and(
                    jnp.sum(hd.astype(jnp.int32), axis=0), 1)
                theta = min(L, w_nd)
                negv, rows = lax.top_k(jnp.moveaxis(-aab, 0, -1), theta)
                vals = -negv
                v0 = vals[:, :, 0]
                pm = pm + jnp.sum(_softplus(-aab), axis=0) \
                    + par.astype(jnp.float32) * v0
                ee = par.astype(jnp.int8)
                qn = None
                fm = jnp.zeros((w_nd, L, bs), jnp.int8)
                iota_w = jnp.arange(w_nd, dtype=jnp.int32)[:, None, None]
                for t in range(1, theta):
                    val_t = vals[:, :, t]
                    v0c = v0
                    if qn is not None:
                        val_t = jnp.take_along_axis(val_t, qn, axis=0)
                        v0c = jnp.take_along_axis(v0, qn, axis=0)
                    pen = val_t \
                        + (1.0 - 2.0 * ee.astype(jnp.float32)) * v0c
                    pmc = jnp.concatenate([pm, pm + pen], axis=0)
                    neg_vals, idxk = lax.top_k(-pmc.T, L)
                    pm = (-neg_vals).T
                    parent = (idxk % L).T.astype(jnp.int32)
                    flip = (idxk // L).T.astype(jnp.int8)
                    compose_live(parent, j_end, sg_nd)
                    qn = (parent if qn is None
                          else jnp.take_along_axis(qn, parent, axis=0))
                    fm = jnp.take_along_axis(fm, parent[None], axis=1)
                    ee = jnp.take_along_axis(ee, parent, axis=0) ^ flip
                    row_t = jnp.take_along_axis(
                        rows[:, :, t].astype(jnp.int32), qn, axis=0)
                    fm = fm ^ jnp.where(
                        (iota_w == row_t[None]) & (flip[None] == 1),
                        jnp.int8(1), jnp.int8(0))
                row_0 = rows[:, :, 0].astype(jnp.int32)
                if qn is not None:
                    row_0 = jnp.take_along_axis(row_0, qn, axis=0)
                fm = fm ^ jnp.where(
                    (iota_w == row_0[None]) & (ee[None] == 1),
                    jnp.int8(1), jnp.int8(0))
                c = (hd if qn is None
                     else jnp.take_along_axis(hd, qn[None], axis=1)) ^ fm
                node_sums = c
                em = polar_transform(c.reshape(q, w_sub, L, bs), axis=0)
                for jj in range(j0, j_end + 1):
                    cws_l[jj] = em[jj - j0]
                    ps_l[jj] = qn if jj == j0 else None
            else:
                # repetition spanning q subtrees: one fork (Eq. 31)
                a_c = clip(cur)
                pmc = jnp.concatenate(
                    [pm + jnp.sum(_softplus(-a_c), axis=0),
                     pm + jnp.sum(_softplus(a_c), axis=0)], axis=0)
                neg_vals, idxk = lax.top_k(-pmc.T, L)
                pm = (-neg_vals).T
                parent = (idxk % L).T.astype(jnp.int32)
                ubit = (idxk // L).T.astype(jnp.int8)  # [L, bs]
                compose_live(parent, j_end, sg_nd)
                node_sums = jnp.broadcast_to(ubit[None],
                                             (1 << s_real, L, bs))
                cw_rep = jnp.broadcast_to(ubit[None], (w_sub, L, bs))
                for jj in range(j0, j_end + 1):
                    cws_l[jj] = cw_rep
                    # the fork's parent map rides the FIRST covered subtree:
                    # backtracking then reads every covered emission with
                    # the post-fork label and switches to pre-fork slots
                    # for everything before the node
                    ps_l[jj] = parent if jj == j0 else None
            rise(node_sums, j_end, sg_nd)

    # ---- survivor backtracking (label=None tracks the identity) ----
    label = None
    cw_parts = [None] * m
    for j in range(m - 1, -1, -1):
        cw_parts[j] = (cws_l[j] if label is None else
                       jnp.take_along_axis(cws_l[j], label[None], axis=1))
        if ps_l[j] is not None:
            label = (ps_l[j] if label is None else
                     jnp.take_along_axis(ps_l[j], label, axis=0))
    cw = jnp.stack(cw_parts, axis=0)  # [m, 2^b, L, bs]
    u = polar_transform(cw, axis=1)
    return u.reshape(n, L, bs), pm
