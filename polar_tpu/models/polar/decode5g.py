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
                 mode: str = "minsum", use_fast_scl=None,
                 output_dtype=jnp.float32):
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
        pc_pos = getattr(enc_polar, "pc_pos", None)
        if dec_type == "SC":
            # CRC cannot aid plain SC decoding (reference prints the same
            # warning, dec.py:565)
            self._polar_dec = PolarSCDecoder(enc_polar._frozen_pos,
                                             self._n_polar, mode=mode,
                                             pc_pos=pc_pos)
        elif dec_type == "SCL":
            iil_inv = (np.argsort(rm.input_interleaver(
                np.arange(self._k_polar))) if self._iil else None)
            self._polar_dec = PolarSCLDecoder(
                enc_polar._frozen_pos, self._n_polar, list_size=list_size,
                crc_degree=crc_degree, mode=mode, ind_iil_inv=iil_inv,
                pc_pos=pc_pos, use_fast_scl=use_fast_scl)
        elif dec_type == "hybSCL":
            # SC-first CA-SCL (the reference's _decode_np_hybrid algorithm,
            # my_sn/fec/polar/dec.py:437-470, which it force-disables at
            # :498 — working here)
            from polar_tpu.models.polar.hybrid import HybridSCLDecoder
            iil_inv = (np.argsort(rm.input_interleaver(
                np.arange(self._k_polar))) if self._iil else None)
            self._polar_dec = HybridSCLDecoder(
                enc_polar._frozen_pos, self._n_polar, list_size=list_size,
                crc_degree=crc_degree, mode=mode, ind_iil_inv=iil_inv,
                pc_pos=getattr(enc_polar, "pc_pos", None),
                use_fast_scl=use_fast_scl)
        else:
            raise ValueError("Unknown value for dec_type.")

        self.requires_host = getattr(self._polar_dec, "requires_host", False)
        self._dec_crc = CRCDecoder(enc_polar.enc_crc)
        self._jit_decode = jax.jit(self._decode_2d)
        # host-orchestrated decoders (hybSCL) cannot sit inside one jitted
        # program; keep the rate recovery and the CRC strip jitted around it
        self._jit_front = jax.jit(
            lambda llr: self._rate_recover(llr.astype(jnp.float32)))
        self._jit_post = jax.jit(self._post)

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

    def _post(self, u_hat_crc):
        """Info-word post-processing: undo IIL, strip+check outer CRC."""
        if self._iil:
            u_hat_crc = jnp.take(u_hat_crc, self._ind_iil_inv, axis=-1)
        u_hat, crc_status = self._dec_crc(u_hat_crc)
        return u_hat.astype(self._output_dtype), crc_status[..., 0]

    def _decode_2d(self, llr_logits):
        llr_dec = self._rate_recover(llr_logits.astype(jnp.float32))
        u_hat_crc = self._polar_dec.decode(llr_dec)  # [bs, k_polar]
        u_hat, crc_status = self._post(u_hat_crc)
        if self.return_crc_status:
            return u_hat, crc_status
        return u_hat

    def __call__(self, inputs):
        assert inputs.shape[-1] == self._n_target, \
            "last dim must be of length n"
        assert inputs.ndim > 1
        lead = inputs.shape[:-1]
        flat = inputs.reshape(-1, self._n_target)
        if self.requires_host:
            # three-program hybrid schedule: jitted rate recovery ->
            # host-orchestrated SC/SCL -> jitted CRC strip
            llr_dec = self._jit_front(flat)
            u_hat_crc = self._polar_dec(llr_dec)
            u, status = self._jit_post(u_hat_crc)
            res = (u, status) if self.return_crc_status else u
        else:
            res = self._jit_decode(flat)
        if self.return_crc_status:
            u, status = res
            return (u.reshape(lead + (self._k_target,)),
                    status.reshape(lead))
        return res.reshape(lead + (self._k_target,))

    def decode(self, llr_logits):
        if self.requires_host:
            raise RuntimeError(
                "dec_type='hybSCL' needs a host synchronization and cannot "
                "run inside jit; call the decoder (__call__) instead.")
        return self._decode_2d(llr_logits)

    def decode_pipelined(self, llr_batches, scl_batch: int = 8192):
        """hybSCL serving path: many batches, one mask sync, cross-batch
        SCL re-decodes (see ``HybridSCLDecoder.decode_pipelined``)."""
        assert self.requires_host, "decode_pipelined is the hybSCL path"
        fronts = [self._jit_front(jnp.reshape(x, (-1, self._n_target)))
                  for x in llr_batches]
        mids = self._polar_dec.decode_pipelined(fronts, scl_batch=scl_batch)
        outs = []
        for m in mids:
            u, status = self._jit_post(m)
            outs.append((u, status) if self.return_crc_status else u)
        return outs

    def prewarm(self, bs: int, scl_capacity: int = None):
        if self.requires_host:
            self._jit_front(jnp.zeros((bs, self._n_target), jnp.float32))
            self._polar_dec.prewarm(bs, scl_capacity)
