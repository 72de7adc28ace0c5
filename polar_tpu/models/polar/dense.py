"""Dense-G encode/decode chain for arbitrary polar kernels.

The reference CLI's encoder accepts ANY kernel matrix: it scatters the info
bits into the non-frozen positions and encodes by dense matmul
``c = u @ G % 2`` with ``G = kern^{\\otimes s}``
(``x_run_sn_polar/polar/enc.py:30-43`` built from the chosen kern by
``x_run_sn_polar/polar/froze.py:4-16``). Its SC/SCL decoders are F2-only,
so the universal decode path for a non-F2 kernel code is ordered-statistics
decoding (``polar_tpu/models/osd.py`` — works for any linear code).

TPU-first notes: the generator ``G`` is a host-NumPy compile-time constant
embedded into the jitted matmul (MXU work, ``int_mod_2`` fold); the info-bit
recovery ``u = c_hat @ G^{-1} % 2`` uses the Kronecker identity
``(A \\otimes B)^{-1} = A^{-1} \\otimes B^{-1}`` over GF(2), so only the
small base kernel is ever eliminated.
"""

import numpy as np
import jax.numpy as jnp

from polar_tpu.utils.numerics import int_mod_2
from polar_tpu.models.polar.construction import (
    gen_arikan, info_positions, ARIKAN_F2)


def gf2_inv(m: np.ndarray) -> np.ndarray:
    """GF(2) inverse of a square 0/1 matrix (host NumPy elimination)."""
    m = (np.asarray(m, dtype=np.int64) & 1).copy()
    n = m.shape[0]
    assert m.shape == (n, n)
    aug = np.concatenate([m, np.eye(n, dtype=np.int64)], axis=1)
    for c in range(n):
        piv = np.nonzero(aug[c:, c])[0]
        if piv.size == 0:
            raise ValueError("kernel matrix is singular over GF(2)")
        p = c + int(piv[0])
        if p != c:
            aug[[c, p]] = aug[[p, c]]
        rows = np.nonzero(aug[:, c])[0]
        rows = rows[rows != c]
        if rows.size:
            aug[rows] ^= aug[c]
    return aug[:, n:]


class DenseKernelEncoder:
    """Encoder for a polar-family code over an arbitrary kernel.

    ``__call__(u[..., k]) -> c[..., n]``: scatter info bits into the
    non-frozen positions (frozen = 0), encode by ``c = u @ G % 2`` with
    ``G = kern^{\\otimes s}``. Parity with the reference CLI encoder
    (``x_run_sn_polar/polar/enc.py:8-43``), which takes any ``G``.
    """

    def __init__(self, frozen_pos, n: int, kern=ARIKAN_F2,
                 dtype=jnp.float32):
        n = int(n)
        kern = np.asarray(kern, dtype=np.int64) & 1
        base = kern.shape[0]
        stages = int(round(np.log(n) / np.log(base)))
        assert base ** stages == n, f"{n=} is not a power of {base=}"
        self.dtype = dtype
        self._n = n
        self._kern = kern
        self._frozen_pos = np.asarray(frozen_pos, dtype=np.int64)
        self.info_pos = info_positions(self._frozen_pos, n)
        self._k = n - len(self._frozen_pos)
        assert self._k == len(self.info_pos), "invalid info_pos generated."
        self.generator = gen_arikan(kern, stages)  # [n, n] 0/1 int64
        self._g_f32 = self.generator.astype(np.float32)
        # scatter-as-gather (see PolarEncoder): padded u gathered to length
        # n, frozen positions point at the appended zero slot
        gather = np.full(n, self._k, dtype=np.int64)
        gather[self.info_pos] = np.arange(self._k)
        self._scatter_idx = gather

    @property
    def k(self):
        return self._k

    @property
    def n(self):
        return self._n

    @property
    def frozen_pos(self):
        return self._frozen_pos

    def scatter_info(self, u):
        pad = jnp.zeros(u.shape[:-1] + (1,), dtype=u.dtype)
        u_pad = jnp.concatenate([u, pad], axis=-1)
        return jnp.take(u_pad, self._scatter_idx, axis=-1)

    def __call__(self, u):
        assert u.shape[-1] == self._k, "last dim must be of length k"
        c = self.scatter_info(u).astype(jnp.float32)
        cw = jnp.matmul(c, self._g_f32,
                        preferred_element_type=jnp.float32)
        return int_mod_2(cw).astype(self.dtype)


class DenseKernelDecoder:
    """Info-bit decoder for :class:`DenseKernelEncoder` codes.

    Order-``t`` OSD (the only universal linear-code decoder — SC/SCL are
    F2-only here as in the reference, whose CLI *encoder* takes any G but
    whose decoders don't) followed by ``u = c_hat @ G^{-1} % 2`` and an
    info-position gather, so the system-model contract (info bits out)
    matches the SC/SCL decoders. ``__call__(llr_logits[..., n]) ->
    u_hat[..., k]``.
    """

    def __init__(self, encoder: DenseKernelEncoder, t: int = 2,
                 **osd_kwargs):
        from polar_tpu.models.osd import OSDecoder
        self._enc = encoder
        self._osd = OSDecoder(t=t, encoder=encoder, **osd_kwargs)
        self.t = int(t)
        # (A (x) B)^-1 = A^-1 (x) B^-1 over GF(2): invert only the base
        # kernel, then Kronecker-power the inverse
        kern = encoder._kern
        stages = int(round(np.log(encoder.n) / np.log(kern.shape[0])))
        self._g_inv = gen_arikan(gf2_inv(kern),
                                 max(stages, 1)).astype(np.float32)

    @property
    def k(self):
        return self._enc.k

    @property
    def n(self):
        return self._enc.n

    def __call__(self, llr):
        c_hat = self._osd(llr).astype(jnp.float32)
        u = int_mod_2(jnp.matmul(c_hat, self._g_inv,
                                 preferred_element_type=jnp.float32))
        return jnp.take(u, self._enc.info_pos, axis=-1)
