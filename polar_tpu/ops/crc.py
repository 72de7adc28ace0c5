"""CRC encoding/checking via dense generator matrices (MXU-friendly).

The 6 polynomials of 3GPP TS 38.212 Sec. 5.1 are supported
(`CRC24A/B/C, CRC16, CRC11, CRC6`) — capability parity with reference
``my_sn/fec/crc.py`` (whose G-matrix approach we also adopt, because a
``[bs, k] @ [k, L]`` 0/1 matmul + mod-2 is exactly what the TPU MXU wants;
sums stay < 2^24 so float32 accumulation is exact).

The generator matrix is built on host in O(k) by stepping the shift register
once per unit vector. The reference's `self.device` bug
(``my_sn/fec/crc.py:81``) does not exist here by design — construction is
pure NumPy, runtime is pure JAX.
"""

import numpy as np
import jax.numpy as jnp

from polar_tpu.utils.numerics import int_mod_2

# polynomial coefficients (exponents with coefficient 1), TS 38.212 Sec. 5.1
CRC_POLYNOMIALS = {
    "CRC24A": [24, 23, 18, 17, 14, 11, 10, 7, 6, 5, 4, 3, 1, 0],
    "CRC24B": [24, 23, 6, 5, 1, 0],
    "CRC24C": [24, 23, 21, 20, 17, 15, 13, 12, 8, 4, 2, 1, 0],
    "CRC16": [16, 12, 5, 0],
    "CRC11": [11, 10, 9, 5, 0],
    "CRC6": [6, 5, 0],
}


def crc_polynomial(crc_degree: str):
    """MSB-first binary coefficient vector of length ``L+1`` and length ``L``."""
    if crc_degree not in CRC_POLYNOMIALS:
        raise ValueError(f"Invalid CRC polynomial {crc_degree!r}")
    exps = CRC_POLYNOMIALS[crc_degree]
    length = max(exps)
    bits = np.zeros(length + 1, dtype=np.int64)
    for e in exps:
        bits[length - e] = 1  # MSB (x^L) first
    return bits, length


def crc_generator_matrix(k: int, crc_degree: str) -> np.ndarray:
    """``[k, L]`` parity-generator matrix: row i = CRC parity of unit vector i.

    Built in O(k) shift-register steps: with ``g(x) = x^L + g_low(x)``,
    ``r_{k-1} = x^L mod g = g_low`` and ``r_{i-1} = x * r_i mod g``.
    """
    poly, L = crc_polynomial(crc_degree)
    g_low = poly[1:]  # coefficients below x^L, MSB first
    gmat = np.zeros((k, L), dtype=np.int64)
    r = g_low.copy()
    for i in range(k - 1, -1, -1):
        gmat[i] = r
        msb = r[0]
        r = np.concatenate([r[1:], [0]])
        if msb:
            r = np.bitwise_xor(r, g_low)
    return gmat


class CRCEncoder:
    """Appends CRC parity bits: ``[..., k] -> [..., k + crc_length]``.

    ``__call__`` is a pure, jittable function of the input bits.
    """

    def __init__(self, crc_degree: str, k: int, dtype=jnp.float32):
        self.crc_degree = crc_degree
        self.dtype = dtype
        _, self.crc_length = crc_polynomial(crc_degree)
        self.k = int(k)
        self.n = self.k + self.crc_length
        self._gmat = crc_generator_matrix(self.k, crc_degree).astype(np.float32)

    @property
    def crc_pol(self):
        return crc_polynomial(self.crc_degree)[0]

    def __call__(self, bits):
        assert bits.shape[-1] == self.k, "last dim must equal k"
        x = bits.astype(jnp.float32)
        parity = int_mod_2(
            jnp.matmul(x, self._gmat, preferred_element_type=jnp.float32))
        return jnp.concatenate([x, parity], axis=-1).astype(self.dtype)


class CRCDecoder:
    """Validates CRC and strips parity bits.

    ``__call__(bits[..., k+L]) -> (info[..., k], crc_valid[..., 1])`` where
    ``k = crc_encoder.k``. The check computes the parity of the *full* word
    ``w`` and tests that it is all-zero — valid because
    ``parity(w) = w(x) x^L mod g(x)`` and ``x^L`` is invertible mod ``g``
    (all 5G CRC polynomials have a +1 term). Same validation the reference
    performs (``my_sn/fec/crc.py:111-138``).
    """

    def __init__(self, crc_encoder: CRCEncoder):
        assert isinstance(crc_encoder, CRCEncoder)
        self._encoder = crc_encoder
        self.crc_length = crc_encoder.crc_length
        # check matrix for the full word length (info + parity)
        self._check_mat = crc_generator_matrix(
            crc_encoder.n, crc_encoder.crc_degree).astype(np.float32)

    def __call__(self, bits):
        assert bits.shape[-1] == self._encoder.n, (
            "CRCDecoder input length must equal encoder.k + crc_length "
            "(the full info+parity word)")
        x = bits.astype(jnp.float32)
        parity = int_mod_2(
            jnp.matmul(x, self._check_mat,
                       preferred_element_type=jnp.float32))
        crc_valid = jnp.sum(parity, axis=-1, keepdims=True) == 0
        info = bits[..., : -self.crc_length]
        return info, crc_valid
