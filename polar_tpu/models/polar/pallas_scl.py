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

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from polar_tpu.ops.fg import F_FUNCTIONS, g as g_op
from polar_tpu.models.polar.scan_core import leaf_schedule

_BIG = 3.0e38  # plain float: jnp constants would be captured by the kernel


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
    """Per-lane row gather of an [L, TB] tile for L in {8, 16}.

    L=16 decomposes into 8-row tile gathers: each destination half gathers
    from both source halves with clamped indices and selects by ``ptr < 8``
    (Mosaic's dynamic-gather is single-tile only). Compiles correctly with
    a 128-lane batch tile; wider tiles trip a Mosaic vector-layout check
    (``limits[i] <= dim(i)`` in vector_extract_strided_slice), so
    ``subtree_pallas`` caps TB at 128 for L=16. Verified bit-exact (cw, P)
    against interpret mode up to b=8; pm differs only by cross-backend
    float noise."""
    L = x2d.shape[0]
    if L <= 8:
        # compiled path only ever sees L == 8 (scan_core gates on it);
        # interpret mode (CPU tests) handles any L
        return _g8(x2d, ptr)
    assert L == 16, "pallas path supports list sizes 8 and 16"
    outs = []
    for h in (0, 1):
        p = ptr[8 * h:8 * h + 8]
        g_lo = _g8(x2d[:8], jnp.clip(p, 0, 7))
        g_hi = _g8(x2d[8:], jnp.clip(p - 8, 0, 7))
        outs.append(jnp.where(p < 8, g_lo, g_hi))
    return jnp.concatenate(outs, axis=0)


def _subtree_kernel(frz_ref, a_ref, pm_ref, cw_ref, p_ref, pmo_ref,
                    lloc, uloc, *, b, L, llr_max, mode):
    f = F_FUNCTIONS[mode]
    w_sub = 1 << b
    TB = a_ref.shape[-1]
    off = lambda s: (1 << s) - 1
    _, dsub, rsub = leaf_schedule(w_sub)
    ident = lax.broadcasted_iota(jnp.int32, (L, TB), 0)
    iota2l = lax.broadcasted_iota(jnp.int32, (2 * L, TB), 0)
    clip = lambda x: jnp.clip(x, -llr_max, llr_max)
    softplus = lambda x: jnp.logaddexp(0.0, x)

    lptr = [ident] * (b + 1)   # stage-s pointer for lloc
    uptr = [ident] * b         # stage-s pointer for uloc
    P = ident                  # parent-map composition over the subtree
    pm = pm_ref[:]
    # stage-b LLRs are NOT copied into scratch: reads go straight to the
    # input block (a_ref). Halving the workspace doubles the VMEM-legal
    # batch tile, which halves the grid and with it the kernel's
    # issue-bound tiny-op count.

    def readl(s):
        seg = a_ref[:] if s == b else lloc[off(s):off(s + 1)]
        return jnp.stack([_gather_rows(seg[j], lptr[s])
                          for j in range(1 << s)], axis=0)

    def readu(s):
        seg = uloc[off(s):off(s + 1)]
        return jnp.stack([_gather_rows(seg[j], uptr[s])
                          for j in range(1 << s)], axis=0)

    for i in range(w_sub):
        d, r = int(dsub[i]), int(rsub[i])
        # ---- descent to stage 0 ----
        if i == 0:
            cur = a_ref[:]
            for s in range(b, 0, -1):
                h = 1 << (s - 1)
                cur = f(cur[:h], cur[h:], llr_max)
                lloc[off(s - 1):off(s)] = cur
                lptr[s - 1] = ident
        else:
            seg = readl(d + 1)
            h = 1 << d
            cur = g_op(seg[:h], seg[h:], readu(d))
            lloc[off(d):off(d + 1)] = cur
            lptr[d] = ident
            for s in range(d, 0, -1):
                h = 1 << (s - 1)
                cur = f(cur[:h], cur[h:], llr_max)
                lloc[off(s - 1):off(s)] = cur
                lptr[s - 1] = ident
        # ---- branchless leaf fork ----
        v = clip(cur[0])                       # [L, TB]
        sp_n = softplus(-v)
        pmc = jnp.concatenate([pm + sp_n, pm + softplus(v)], axis=0)
        tmp = pmc
        vals, idxs = [], []
        for _j in range(L):  # iterative min extraction == top_k ties
            val = jnp.min(tmp, axis=0, keepdims=True)   # [1, TB]
            idx = jnp.min(jnp.where(tmp == val, iota2l, 2 * L),
                          axis=0, keepdims=True)
            vals.append(val)
            idxs.append(idx)
            tmp = jnp.where(iota2l == idx, _BIG, tmp)
        pm_fork = jnp.concatenate(vals, axis=0)         # [L, TB] ascending
        sel = jnp.concatenate(idxs, axis=0).astype(jnp.int32)
        frz_i = frz_ref[i] != 0
        pm = jnp.where(frz_i, pm + sp_n, pm_fork)
        parent = jnp.where(frz_i, ident, sel % L)
        ubit = jnp.where(frz_i, jnp.zeros((L, TB), jnp.int32),
                         sel // L)[None]       # [1, L, TB]
        lptr = [_gather_rows(p, parent) for p in lptr]
        uptr = [_gather_rows(p, parent) for p in uptr]
        P = _gather_rows(P, parent)
        # ---- rise: combine partial sums upward ----
        cur_u = ubit
        for s in range(min(r, b)):
            cur_u = jnp.concatenate([readu(s) ^ cur_u, cur_u], axis=0)
        if r >= b:
            cw_ref[:] = cur_u                  # subtree codeword (last leaf)
        else:
            uloc[off(r):off(r + 1)] = cur_u
            uptr[r] = ident
    p_ref[:] = P
    pmo_ref[:] = pm


def _sc_subtree_kernel(frz_ref, a_ref, cw_ref, lloc, uloc, *, b, llr_max,
                       mode):
    """SC specialization: no list dimension, no forks — a pure unrolled
    descent/rise sweep over VMEM workspaces with branchless frozen
    decisions. ``a_ref``: [2^b, TB] stage-b LLRs -> ``cw_ref`` [2^b, TB]
    int32 subtree codeword."""
    f = F_FUNCTIONS[mode]
    w_sub = 1 << b
    off = lambda s: (1 << s) - 1
    _, dsub, rsub = leaf_schedule(w_sub)
    clip = lambda x: jnp.clip(x, -llr_max, llr_max)

    # stage-b LLRs read straight from the input block (no scratch copy —
    # halves the workspace, doubling the VMEM-legal batch tile)
    for i in range(w_sub):
        d, r = int(dsub[i]), int(rsub[i])
        if i == 0:
            cur = a_ref[:]
            for s in range(b, 0, -1):
                h = 1 << (s - 1)
                cur = f(cur[:h], cur[h:], llr_max)
                lloc[off(s - 1):off(s)] = cur
        else:
            seg = (a_ref[:] if d + 1 == b
                   else lloc[off(d + 1):off(d + 2)])
            h = 1 << d
            cur = g_op(seg[:h], seg[h:], uloc[off(d):off(d + 1)])
            lloc[off(d):off(d + 1)] = cur
            for s in range(d, 0, -1):
                h = 1 << (s - 1)
                cur = f(cur[:h], cur[h:], llr_max)
                lloc[off(s - 1):off(s)] = cur
        frz_i = frz_ref[i] != 0
        # frozen -> 0; else hard decision (0-LLR tie -> bit 1)
        ubit = jnp.where(frz_i, jnp.zeros_like(cur, dtype=jnp.int32),
                         (cur <= 0).astype(jnp.int32))
        cur_u = ubit
        for s in range(min(r, b)):
            cur_u = jnp.concatenate(
                [uloc[off(s):off(s + 1)] ^ cur_u, cur_u], axis=0)
        if r >= b:
            cw_ref[:] = cur_u
        else:
            uloc[off(r):off(r + 1)] = cur_u


@functools.partial(jax.jit, static_argnames=("b", "llr_max", "mode",
                                             "interpret", "tile"))
def sc_subtree_pallas(a, frz, *, b, llr_max, mode, interpret=False,
                      tile=None):
    """Fused SC subtree. ``a``: [2^b, bs] f32 stage-b LLRs, ``frz``:
    [2^b] int32 -> cw [2^b, bs] int32."""
    w_sub, bs = a.shape
    assert w_sub == (1 << b)
    W = (1 << b) - 1  # stages 0..b-1; stage b reads the input block
    TB = tile if tile is not None else _auto_tile(bs, W, 8)
    TB = min(TB, bs)
    assert bs % TB == 0
    kern = functools.partial(_sc_subtree_kernel, b=b,
                             llr_max=float(llr_max), mode=mode)
    bspec = pl.BlockSpec((w_sub, TB), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(bs // TB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), bspec],
        out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct((w_sub, bs), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((W, TB), jnp.float32),
            pltpu.VMEM((W, TB), jnp.int32),
        ],
        interpret=interpret,
    )(frz, a)


def _auto_tile(bs: int, rows: int, lanes_bytes: int,
               budget: int = 6 * 2 ** 20) -> int:
    """Largest 128-multiple batch tile whose VMEM scratch fits the budget
    (``rows * lanes_bytes`` bytes per batch column). The budget leaves
    headroom below the 16MB VMEM for the kernel's input/output blocks
    (a/cw/pm) and the compiler's own staging."""
    if bs % 128:
        # unaligned batch: a single whole-batch tile is the only legal grid
        return bs
    tb = (budget // (rows * lanes_bytes)) // 128 * 128
    tb = max(128, min(tb, bs))
    while bs % tb:
        tb -= 128
    return max(tb, 128)


@functools.partial(jax.jit, static_argnames=("b", "L", "llr_max", "mode",
                                             "interpret", "tile"))
def subtree_pallas(a, frz, pm, *, b, L, llr_max, mode, interpret=False,
                   tile=None):
    """Run the fused subtree kernel. ``a``: [2^b, L, bs] f32 stage-b LLRs,
    ``frz``: [2^b] int32, ``pm``: [L, bs] f32. Returns
    (cw [2^b, L, bs] int32, P [L, bs] int32, pm [L, bs] f32)."""
    w_sub, L_, bs = a.shape
    assert w_sub == (1 << b) and L_ == L
    W = (1 << b) - 1  # stages 0..b-1 only; stage b reads the input block
    # scratch per batch column: (lloc f32 + uloc i32) W rows x L sublanes.
    # The input (a) and output (cw) blocks add ~2/3 of scratch again, so a
    # 10MB scratch budget stays inside the 16MB VMEM.
    TB = tile if tile is not None else _auto_tile(bs, W * L, 8,
                                                  budget=10 * 2 ** 20)
    if L > 8 and bs % 128 == 0:
        # L=16 two-tile select-gather miscompiles beyond one 128-lane tile
        # (Mosaic vector_extract_strided_slice `limits[i] <= dim(i)`); a
        # 128-lane grid is layout-safe and verified bit-exact vs interpret
        TB = min(TB, 128)
    TB = min(TB, bs)
    assert bs % TB == 0, f"bs={bs} must be a multiple of the tile {TB}"
    grid = (bs // TB,)
    kern = functools.partial(_subtree_kernel, b=b, L=L,
                             llr_max=float(llr_max), mode=mode)
    bspec = lambda rows: pl.BlockSpec((rows, L, TB),
                                      lambda i: (0, 0, i),
                                      memory_space=pltpu.VMEM)
    bspec2 = pl.BlockSpec((L, TB), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # frz (whole array)
            bspec(w_sub),                           # a
            bspec2,                                 # pm
        ],
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
        interpret=interpret,
    )(frz, a, pm)
