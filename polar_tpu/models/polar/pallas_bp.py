"""Fused Pallas TPU kernel for iterative BP polar decoding.

One ``pallas_call`` runs the ENTIRE BP decode (all ``num_iter`` sweeps)
per batch tile with the full message lattice VMEM-resident — the XLA
engine (bp.py) re-reads and re-writes the ``2 x [S+1, n, bs]`` lattice
from HBM at every stage of every sweep (~4x off the HBM roofline at
n=1024, measured), while this kernel touches HBM exactly twice per
codeword: one read of the channel LLRs, one write of the info-side soft
output.

The butterfly is expressed ROWWISE so no reshape ever happens inside the
kernel (Mosaic-friendly: only static row slices, concats, selects — the
same op set as the proven SCL kernels in pallas_scl.py): the stage-s
partner of row ``i`` is ``i XOR 2^s``, materialized as two shift-concats
(``x[i+2^s]`` / ``x[i-2^s]``) selected by the bit mask. Wrap rows from
the shifts are never selected. The processing-element update
(bp.py docstring, Arikan BP over the encoding graph) becomes, with
``A = lmsg[s+1]``, ``B = rmsg[s]``, ``Ap/Bp`` their partners:

    l_new = where(bit_s==0, f(A, Ap + Bp), f(Ap, Bp) + A)
    r_new = where(bit_s==0, f(B, Ap + Bp), f(Bp, Ap) + B)

G-matrix early stopping keeps the exact XLA-engine semantics: every
``check_every`` sweeps each lane's info-side hard decision is re-encoded
(same rowwise XOR butterfly) and compared to the channel-side hard
decision; converged lanes FREEZE (writes are ``where(done, old, new)``)
— bit-identical to the engine's chunk-level select because ``done`` is
constant within a chunk. The kernel runs all chunks (a converged lane's
extra sweeps are no-ops), so values match the engine's early-exit loop.

Iterations run in a ``lax.fori_loop`` INSIDE the kernel, so the traced
body stays ~1k ops regardless of ``num_iter``.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from polar_tpu.ops.fg import F_FUNCTIONS, make_scaled_minsum
from polar_tpu.models.polar.pallas_scl import fit_tile, _vmem_limit_override


def _roll_up(x, d):
    """x[i + d] with wraparound (wrap rows are never selected)."""
    return jnp.concatenate([x[d:], x[:d]], axis=0)


def _roll_dn(x, d):
    """x[i - d] with wraparound."""
    return jnp.concatenate([x[-d:], x[:-d]], axis=0)


def _bp_kernel(llr_ref, prior_ref, out_ref, *rest, S, num_iter,
               check_every, early_stop, mode, msf, llr_max,
               slice_min=3, return_done=False):
    if return_done:
        done_ref, lmsg, rmsg, done = rest
    else:
        lmsg, rmsg, done = rest
    n, TB = llr_ref.shape
    f = (make_scaled_minsum(msf)
         if mode in ("minsum", "max") and msf != 1.0 else F_FUNCTIONS[mode])
    rows = lax.broadcasted_iota(jnp.int32, (n, TB), 0)

    def mask_u(s):
        return ((rows >> s) & 1) == 0

    def partner(x, s):
        d = 1 << s
        return jnp.where(mask_u(s), _roll_up(x, d), _roll_dn(x, d))

    # lattice layout: stage s of lmsg/rmsg = scratch rows [s*n, (s+1)*n)
    zero_rows = jnp.zeros((n, TB), jnp.float32)
    for s in range(S):
        lmsg[s * n:(s + 1) * n] = zero_rows
        rmsg[(s + 1) * n:(s + 2) * n] = zero_rows
    lmsg[S * n:(S + 1) * n] = llr_ref[:]
    rmsg[0:n] = prior_ref[:]

    def keep_sel(old, new):
        if not early_stop:
            return new
        return jnp.where(done[0:1, :] != 0, old, new)

    # Stages with span >= 8 rows use SLICED block updates: the u/v halves
    # of every butterfly block are contiguous sublane-tile-aligned row
    # ranges, so the PE update reads them directly — no partner rolls, no
    # branch duplication, no select; HALF the f evaluations of the rowwise
    # form and zero shuffle traffic. Bit-identical by construction (the
    # rowwise where() form computes exactly these expressions per half).
    # Stages 0..2 (span < 8 rows, sub-tile slices) keep the rowwise form.
    # ``slice_min`` is resolved by bp_pallas (env POLAR_TPU_BP_SLICE_MIN,
    # floored at 3) and rides the jit cache key as a static arg —
    # reading the env here at trace time silently reused stale
    # executables after an env change (ADVICE r4).
    SLICE_MIN = slice_min

    def pe_l(s):
        span = 1 << s
        for base in range(0, n, 2 * span):
            Au = lmsg[(s + 1) * n + base:(s + 1) * n + base + span]
            Av = lmsg[(s + 1) * n + base + span:
                      (s + 1) * n + base + 2 * span]
            Bu = rmsg[s * n + base:s * n + base + span]
            Bv = rmsg[s * n + base + span:s * n + base + 2 * span]
            l_u = f(Au, Av + Bv, llr_max)
            l_v = f(Au, Bu, llr_max) + Av
            lmsg[s * n + base:s * n + base + span] = keep_sel(
                lmsg[s * n + base:s * n + base + span], l_u)
            lmsg[s * n + base + span:s * n + base + 2 * span] = keep_sel(
                lmsg[s * n + base + span:s * n + base + 2 * span], l_v)

    def pe_r(s):
        span = 1 << s
        for base in range(0, n, 2 * span):
            Au = lmsg[(s + 1) * n + base:(s + 1) * n + base + span]
            Av = lmsg[(s + 1) * n + base + span:
                      (s + 1) * n + base + 2 * span]
            Bu = rmsg[s * n + base:s * n + base + span]
            Bv = rmsg[s * n + base + span:s * n + base + 2 * span]
            r_u = f(Bu, Av + Bv, llr_max)
            r_v = f(Bu, Au, llr_max) + Bv
            rmsg[(s + 1) * n + base:(s + 1) * n + base + span] = keep_sel(
                rmsg[(s + 1) * n + base:(s + 1) * n + base + span], r_u)
            rmsg[(s + 1) * n + base + span:
                 (s + 1) * n + base + 2 * span] = keep_sel(
                rmsg[(s + 1) * n + base + span:
                     (s + 1) * n + base + 2 * span], r_v)

    def sweep():
        for s in range(S - 1, -1, -1):  # right-to-left: update l
            if s >= SLICE_MIN:
                pe_l(s)
                continue
            A = lmsg[(s + 1) * n:(s + 2) * n]
            B = rmsg[s * n:(s + 1) * n]
            Ap, Bp = partner(A, s), partner(B, s)
            l_new = jnp.where(mask_u(s), f(A, Ap + Bp, llr_max),
                              f(Ap, Bp, llr_max) + A)
            lmsg[s * n:(s + 1) * n] = keep_sel(lmsg[s * n:(s + 1) * n],
                                               l_new)
        for s in range(0, S):           # left-to-right: update r
            if s >= SLICE_MIN:
                pe_r(s)
                continue
            A = lmsg[(s + 1) * n:(s + 2) * n]
            B = rmsg[s * n:(s + 1) * n]
            Ap, Bp = partner(A, s), partner(B, s)
            r_new = jnp.where(mask_u(s), f(B, Ap + Bp, llr_max),
                              f(Bp, Ap, llr_max) + B)
            rmsg[(s + 1) * n:(s + 2) * n] = keep_sel(
                rmsg[(s + 1) * n:(s + 2) * n], r_new)

    if early_stop:
        frozen = prior_ref[:] > 0.0

        def converged():
            u_hat = jnp.where(
                frozen, 0,
                (lmsg[0:n] + rmsg[0:n] <= 0.0).astype(jnp.int32))
            x_hat = (lmsg[S * n:(S + 1) * n]
                     + rmsg[S * n:(S + 1) * n] <= 0.0).astype(jnp.int32)
            c = u_hat
            for s in range(S):  # rowwise encode butterfly (G u)
                c = jnp.where(mask_u(s), c ^ _roll_up(c, 1 << s), c)
            return jnp.min(jnp.where(c == x_hat, 1, 0), axis=0,
                           keepdims=True)  # (1, TB) all-rows-equal

        done[0:1, :] = jnp.zeros((1, TB), jnp.int32)
        full = (num_iter // check_every) * check_every

        def chunk(_i, carry):
            for _ in range(check_every):
                sweep()
            done[0:1, :] = done[0:1, :] | converged()
            return carry

        lax.fori_loop(0, num_iter // check_every, chunk, 0)
        for _ in range(num_iter - full):  # static remainder (bp.py chunking)
            sweep()
    else:
        def one(_i, carry):
            sweep()
            return carry

        lax.fori_loop(0, num_iter, one, 0)
    out_ref[:] = lmsg[0:n] + rmsg[0:n]  # info-side total LLR
    if return_done:
        done_ref[:] = jnp.broadcast_to(done[0:1, :], (8, TB))


def bp_vmem_bytes(n: int, S: int, tb: int) -> int:
    """Kernel VMEM footprint: lmsg + rmsg scratch (2 x (S+1) x n rows f32),
    llr/prior/out blocks (3 x n rows), the (8, tb) done-flag scratch and
    the optional (8, tb) done output block."""
    return 4 * tb * (2 * (S + 1) * n + 3 * n + 16)


def bp_pallas(llr, prior, *, S, num_iter, check_every, early_stop, mode,
              msf, llr_max, interpret=False, tile=None, return_done=False):
    """Fused BP decode. ``llr``: [n, bs] f32 true channel LLRs, ``prior``:
    [n] f32 frozen prior (+llr_max at frozen positions, 0 elsewhere) ->
    info-side total LLR [n, bs] f32.

    ``return_done=True`` (needs ``early_stop``) additionally returns the
    kernel's G-matrix convergence flag as ``done [bs] int32`` — the accept
    test of the two-pass serving path (bp.py ``decode_pipelined``).

    POLAR_TPU_BP_SLICE_MIN (default/floor 3) picks the lowest stage that
    uses sliced block updates; it is resolved HERE (not at kernel trace
    time) so it participates in the jit cache key (ADVICE r4). Values
    below 3 would produce sub-sublane-tile slices Mosaic has not been
    validated on, so they are floored."""
    import os
    slice_min = max(3, int(os.environ.get("POLAR_TPU_BP_SLICE_MIN", "3")))
    return _bp_pallas_impl(llr, prior, S=S, num_iter=num_iter,
                           check_every=check_every, early_stop=early_stop,
                           mode=mode, msf=msf, llr_max=llr_max,
                           interpret=interpret, tile=tile,
                           return_done=return_done, slice_min=slice_min)


@functools.partial(jax.jit, static_argnames=(
    "S", "num_iter", "check_every", "early_stop", "mode", "msf", "llr_max",
    "interpret", "tile", "return_done", "slice_min"))
def _bp_pallas_impl(llr, prior, *, S, num_iter, check_every, early_stop,
                    mode, msf, llr_max, interpret=False, tile=None,
                    return_done=False, slice_min=3):
    n, bs = llr.shape
    assert n == 1 << S
    assert not return_done or early_stop, "return_done needs early_stop"
    vlim = _vmem_limit_override()
    TB = tile if tile is not None else fit_tile(
        bs, lambda t: bp_vmem_bytes(n, S, t), vmem_limit=vlim)
    TB = min(TB, bs)
    assert bs % TB == 0
    prior_tile = jnp.broadcast_to(prior[:, None], (n, TB))
    kern = functools.partial(
        _bp_kernel, S=S, num_iter=int(num_iter),
        check_every=int(check_every), early_stop=bool(early_stop),
        mode=mode, msf=float(msf), llr_max=float(llr_max),
        slice_min=int(slice_min), return_done=bool(return_done))
    bspec = pl.BlockSpec((n, TB), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    # the prior block is identical for every tile: constant index map
    pspec = pl.BlockSpec((n, TB), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((8, TB), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    out_specs = [bspec] + ([dspec] if return_done else [])
    out_shape = [jax.ShapeDtypeStruct((n, bs), jnp.float32)] + \
        ([jax.ShapeDtypeStruct((8, bs), jnp.int32)] if return_done else [])
    res = pl.pallas_call(
        kern,
        grid=(bs // TB,),
        in_specs=[bspec, pspec],
        out_specs=out_specs if return_done else out_specs[0],
        out_shape=out_shape if return_done else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM(((S + 1) * n, TB), jnp.float32),
            pltpu.VMEM(((S + 1) * n, TB), jnp.float32),
            pltpu.VMEM((8, TB), jnp.int32),
        ],
        compiler_params=(None if vlim is None
                         else pltpu.CompilerParams(vmem_limit_bytes=vlim)),
        interpret=interpret,
    )(llr, prior_tile)
    if return_done:
        return res[0], res[1][0]
    return res
