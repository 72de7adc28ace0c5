"""The Arikan butterfly (polar transform) as ``log2(n)`` reshape-XOR stages.

TPU-first design note: the reference encodes either by a dense ``c @ G % 2``
matmul (``x_run_sn_polar/polar/enc.py:30-43``) or by per-stage *gather*
tables (``my_sn/fec/polar/enc.py:65-96``). On TPU neither is needed — a
reshape to ``[..., blocks, 2, span]`` plus an XOR of the two halves is a pure
layout-free VPU op per stage, with no gather table and no O(n^2) matmul.

Convention: generator ``G = [[1,0],[1,1]]^{\\otimes s}`` acting as ``c = u @ G``
(the convention of the reference's CLI tree, ``x_run_sn_polar/polar/froze.py:9-12``).
Stage ``s`` XORs, inside every block of ``2^{s+1}`` positions, the upper half
into the lower half. The transform is an involution over GF(2)
(``G @ G = I mod 2``), which the decoders exploit to recover ``u`` from a
decoded codeword with a second butterfly.
"""

import numpy as np
import jax.numpy as jnp


def polar_transform(x, axis=-1):
    """Apply the polar transform along ``axis`` (length must be a power of 2).

    Works on any integer dtype (XOR) or floating dtype (converted to int8 and
    back). The transform is its own inverse.
    """
    x = jnp.asarray(x)
    axis = axis % x.ndim
    n = x.shape[axis]
    stages = int(np.log2(n))
    assert 2 ** stages == n, "transform length must be a power of 2"

    floating = jnp.issubdtype(x.dtype, jnp.floating)
    v = x.astype(jnp.int8) if floating else x

    # Move the transform axis last so the reshape below is layout-friendly.
    if axis != x.ndim - 1:
        v = jnp.moveaxis(v, axis, -1)
    lead = v.shape[:-1]

    for s in range(stages):
        span = 2 ** s
        blk = v.reshape(lead + (n // (2 * span), 2, span))
        low = blk[..., 0, :] ^ blk[..., 1, :]
        v = jnp.stack([low, blk[..., 1, :]], axis=-2).reshape(lead + (n,))

    if axis != x.ndim - 1:
        v = jnp.moveaxis(v, -1, axis)
    return v.astype(x.dtype) if floating else v


def dense_generator(n: int) -> np.ndarray:
    """Host-side dense generator matrix ``G = [[1,0],[1,1]]^{\\otimes log2(n)}``.

    Used for parity checks, OSD initialization and tests (reference keeps the
    same matrix for its runtime H-check, ``my_sn/fec/polar/enc.py:52-61``).
    """
    stages = int(np.log2(n))
    assert 2 ** stages == n
    g = np.array([[1, 0], [1, 1]], dtype=np.int8)
    m = g
    for _ in range(stages - 1):
        m = np.kron(g, m)
    return m
