"""5G-compliant polar decoding: rate recovery + SC/SCL + CRC removal.

Parity with reference ``my_sn/fec/polar/dec.py:539-667``. All de-interleaver
permutations are host-precomputed inverse index arrays; LLR de-matching is
static concatenation/adds, so the whole rate recovery fuses into the decode
program under jit. Unlike the reference, ``return_crc_status=True`` works
(the reference hits a ``breakpoint()`` stub, ``dec.py:661``) and the
downlink input-interleaver inverse is applied.
"""

import numpy as np
import jax
import jax.numpy as jnp

from polar_tpu.ops.crc import CRCEncoder, CRCDecoder
from polar_tpu.models.polar.encode import Polar5GEncoder
from polar_tpu.models.polar import rate_match as rm
from polar_tpu.models.polar.sc import PolarSCDecoder
from polar_tpu.models.polar.scl import PolarSCLDecoder


class Polar5GDecoder:
    """``__call__(llr_logits[..., n]) -> u_hat[..., k]``
    (plus ``crc_status[...]`` if ``return_crc_status``)."""

    def __init__(self, enc_polar: Polar5GEncoder, dec_type: str = "SC",
                 list_size: int = 8, return_crc_status: bool = False,
                 mode: str = "minsum", output_dtype=jnp.float32):
        assert isinstance(enc_polar, Polar5GEncoder)
        self._output_dtype = output_dtype
        self._n_target = enc_polar.n_target
        self._k_target = enc_polar.k_target
        self._n_polar = enc_polar.n_polar
        self._k_polar = enc_polar.k_polar
        self._k_crc = enc_polar.enc_crc.crc_length
        self._bil = enc_polar._channel_type == "uplink"
        self._iil = enc_polar._channel_type == "downlink"
        self._llr_max = 100.0  # for shortened (known-zero) positions
        self._enc_polar = enc_polar
        self._dec_type = dec_type
        self.return_crc_status = bool(return_crc_status)

        # inverse interleaver patterns (host)
        ind_ch_int = rm.channel_interleaver(np.arange(self._n_target))
        self._ind_ch_int_inv = np.argsort(ind_ch_int)
        ind_sub_int = rm.subblock_interleaving(np.arange(self._n_polar))
        self._ind_sub_int_inv = np.argsort(ind_sub_int)
        if self._iil:
            iil = rm.input_interleaver(np.arange(self._k_polar))
            self._ind_iil_inv = np.argsort(iil)
        else:
            self._ind_iil_inv = None

        crc_degree = enc_polar.enc_crc.crc_degree
        if dec_type == "SC":
            # CRC cannot aid plain SC decoding (reference prints the same
            # warning, dec.py:565)
            self._polar_dec = PolarSCDecoder(enc_polar._frozen_pos,
                                             self._n_polar, mode=mode)
        elif dec_type == "SCL":
            iil_inv = (np.argsort(rm.input_interleaver(
                np.arange(self._k_polar))) if self._iil else None)
            self._polar_dec = PolarSCLDecoder(
                enc_polar._frozen_pos, self._n_polar, list_size=list_size,
                crc_degree=crc_degree, mode=mode, ind_iil_inv=iil_inv)
        elif dec_type == "hybSCL":
            raise NotImplementedError(
                "hybSCL is not implemented (disabled in the reference too, "
                "my_sn/fec/polar/dec.py:498)")
        else:
            raise ValueError("Unknown value for dec_type.")

        self._dec_crc = CRCDecoder(enc_polar.enc_crc)
        self._jit_decode = jax.jit(self._decode_2d)

    @property
    def k(self):
        return self._k_target

    @property
    def n(self):
        return self._n_target

    def _rate_recover(self, llr_ch):
        """[bs, n_target] logits -> [bs, n_polar] de-matched logits."""
        if self._bil:
            llr_ch = jnp.take(llr_ch, self._ind_ch_int_inv, axis=-1)
        if self._n_target >= self._n_polar:
            # repetition: fold the tail back onto the head
            n_rep = self._n_target - self._n_polar
            llr_1 = llr_ch[:, :n_rep]
            llr_2 = llr_ch[:, n_rep:self._n_polar]
            llr_3 = llr_ch[:, self._n_polar:]
            llr_dm = jnp.concatenate([llr_1 + llr_3, llr_2], axis=1)
        elif self._k_polar / self._n_target <= 7 / 16:
            # puncturing: unknown head positions get LLR 0
            zeros = jnp.zeros((llr_ch.shape[0],
                               self._n_polar - self._n_target),
                              dtype=llr_ch.dtype)
            llr_dm = jnp.concatenate([zeros, llr_ch], axis=1)
        else:
            # shortening: tail positions are known zeros -> -llr_max logits
            infty = jnp.full((llr_ch.shape[0],
                              self._n_polar - self._n_target),
                             -self._llr_max, dtype=llr_ch.dtype)
            llr_dm = jnp.concatenate([llr_ch, infty], axis=1)
        return jnp.take(llr_dm, self._ind_sub_int_inv, axis=-1)

    def _decode_2d(self, llr_logits):
        llr_dec = self._rate_recover(llr_logits.astype(jnp.float32))
        u_hat_crc = self._polar_dec.decode(llr_dec)  # [bs, k_polar]
        if self._iil:
            u_hat_crc = jnp.take(u_hat_crc, self._ind_iil_inv, axis=-1)
        u_hat, crc_status = self._dec_crc(u_hat_crc)
        if self.return_crc_status:
            return (u_hat.astype(self._output_dtype),
                    crc_status[..., 0])
        return u_hat.astype(self._output_dtype)

    def __call__(self, inputs):
        assert inputs.shape[-1] == self._n_target, \
            "last dim must be of length n"
        assert inputs.ndim > 1
        lead = inputs.shape[:-1]
        res = self._jit_decode(inputs.reshape(-1, self._n_target))
        if self.return_crc_status:
            u, status = res
            return (u.reshape(lead + (self._k_target,)),
                    status.reshape(lead))
        return res.reshape(lead + (self._k_target,))

    def decode(self, llr_logits):
        return self._decode_2d(llr_logits)
