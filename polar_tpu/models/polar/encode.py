"""Polar encoders: plain (frozen-set) and 5G rate-matched.

TPU-first design: info-bit scatter is a single static gather from a
zero-padded input, the Arikan transform is ``log2(n)`` reshape-XOR stages
(``polar_tpu/ops/butterfly.py``), and all 5G rate matching collapses to one
precomputed gather index. No per-forward parity asserts inside jit (the
reference's runtime H-check, ``my_sn/fec/polar/enc.py:110``, is provided as
an explicit ``parity_check`` method and exercised in tests).
"""

import numpy as np
import jax.numpy as jnp

from polar_tpu.ops.butterfly import polar_transform, dense_generator
from polar_tpu.ops.crc import CRCEncoder
from polar_tpu.utils.numerics import int_mod_2
from polar_tpu.models.polar.construction import generate_5g_ranking, info_positions
from polar_tpu.models.polar import rate_match as rm


class PolarEncoder:
    """Polar encoder for a given frozen set.

    ``__call__(u[..., k]) -> c[..., n]`` — scatter info bits into non-frozen
    positions (frozen = 0), apply the polar transform.
    Parity: ``x_run_sn_polar/polar/enc.py:8-43`` / ``my_sn/fec/polar/enc.py:8-113``.
    """

    def __init__(self, frozen_pos, n: int, dtype=jnp.float32):
        n = int(n)
        assert np.log2(n) == int(np.log2(n)), "n must be a power of 2."
        self.dtype = dtype
        self._n = n
        self._frozen_pos = np.asarray(frozen_pos, dtype=np.int64)
        self.info_pos = info_positions(self._frozen_pos, n)
        self._k = n - len(self._frozen_pos)
        assert self._k == len(self.info_pos), "invalid info_pos generated."
        # static scatter-as-gather: padded u (extra zero slot at index k)
        # gathered to length n; frozen positions point at the zero slot.
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
        """Place info bits at ``info_pos`` and zeros at frozen positions."""
        pad = jnp.zeros(u.shape[:-1] + (1,), dtype=u.dtype)
        u_pad = jnp.concatenate([u, pad], axis=-1)
        return jnp.take(u_pad, self._scatter_idx, axis=-1)

    def __call__(self, u):
        assert u.shape[-1] == self._k, "last dim must be of length k"
        c = self.scatter_info(u)
        return polar_transform(c).astype(self.dtype)

    def parity_check(self, c):
        """True where ``c`` is a valid codeword; test/debug aid.

        ``c = u G`` with ``u`` zero at frozen positions, and ``G`` is an
        involution over GF(2), so ``u = c G`` and validity is
        ``(c G)[frozen] = 0`` — i.e. ``H = G[:, frozen]`` (columns at the
        frozen positions; ``G`` is lower-triangular, not symmetric).
        Capability parity with the reference's runtime H-check
        (``my_sn/fec/polar/enc.py:52-61,110``)."""
        g = dense_generator(self._n)
        h = g[:, self._frozen_pos].astype(np.float32)
        syn = int_mod_2(jnp.matmul(c.astype(jnp.float32), h,
                                   preferred_element_type=jnp.float32))
        return jnp.sum(syn, axis=-1) == 0


class Polar5GEncoder(PolarEncoder):
    """5G-compliant polar encoder with rate matching (TS 38.212).

    Chain: CRC attach -> (downlink: input interleave) -> sub-channel
    allocation -> polar transform -> sub-block interleave -> circular-buffer
    rate matching -> (uplink: channel interleave). All index math happens at
    construction; the forward pass is CRC matmul + butterfly + ONE gather.
    Behavior parity: ``my_sn/fec/polar/enc.py:115-393`` (including the
    mother-code size rule, puncture/shorten pre-freezing, and the combined
    gather construction). Unlike the reference, the downlink path is fully
    functional (the reference raises on DL forward, ``enc.py:374-376``).
    """

    def __init__(self, k: int, n: int, channel_type: str = "uplink",
                 verbose: bool = False, enable_pc: bool = True,
                 dtype=jnp.float32):
        k = int(k)
        n = int(n)
        assert n >= k, "Invalid coderate (>1)."
        assert channel_type in ("uplink", "downlink"), "Unsupported channel_type."
        self._channel_type = channel_type
        # TS 38.212 PC bits for uplink 12<=k<=19 (see pc.py). enable_pc=False
        # reproduces the reference's non-compliant no-PC encoding
        # (my_sn/fec/polar/enc.py:262-268) for fixture parity.
        self._enable_pc = bool(enable_pc)
        self._k_target = k
        self._n_target = n
        self._verbose = verbose
        crc_degree, n_polar, frozen_pos, idx_rm, idx_input = \
            self._init_rate_match(k, n)
        self._ind_rate_matching = np.asarray(idx_rm)
        self._ind_input_int = (None if idx_input is None
                               else np.asarray(idx_input))
        super().__init__(frozen_pos, n_polar, dtype=dtype)
        self._enc_crc = CRCEncoder(crc_degree, k=k, dtype=dtype)
        if self._pc_pos is not None:
            from polar_tpu.models.polar import pc
            self._pc_is_data, self._pc_is_pc = pc.pc_flags(
                n_polar, self.info_pos, self._pc_pos)
            data_pos = np.nonzero(self._pc_is_data)[0]
            k_data = len(data_pos)  # payload + CRC
            gather = np.full(n_polar, k_data, dtype=np.int64)
            gather[data_pos] = np.arange(k_data)
            self._pc_scatter_idx = gather

    @property
    def pc_pos(self):
        """PC-bit positions (TS 38.212 5.3.1.2) or None."""
        return self._pc_pos

    # --- public properties (reference-compatible surface) ---
    @property
    def enc_crc(self):
        return self._enc_crc

    @property
    def k_target(self):
        return self._k_target

    @property
    def n_target(self):
        return self._n_target

    @property
    def k_polar(self):
        return self._k

    @property
    def n_polar(self):
        return self._n

    @property
    def k(self):
        return self._k_target

    @property
    def n(self):
        return self._n_target

    # --- host-side rate-match construction ---
    def _init_rate_match(self, k_target: int, n_target: int):
        """Compute CRC choice, mother-code size, frozen set and the combined
        rate-matching gather (Sec. 5.3.1, 5.4.1 of TS 38.212)."""
        assert n_target >= k_target, "n must be larger or equal k."
        assert n_target >= 18, "n < 18 is not supported by 5G Polar coding."
        assert k_target <= 1013, "k too large - no codeword segmentation supported."
        assert n_target <= 1088, "n too large - no codeword segmentation supported."

        if self._channel_type == "uplink":
            if 12 <= k_target <= 19:
                crc_degree, k_crc = "CRC6", 6
            elif k_target >= 20:
                crc_degree, k_crc = "CRC11", 11
            else:
                raise ValueError(
                    "k_target < 12 is not supported in 5G NR uplink; use the "
                    "'channel coding of small block lengths' scheme "
                    "(Sec. 5.3.3 of TS 38.212) instead.")
            # 12<=k<=19: the 3 PC bits of 38.212 Sec. 5.3.1.2 — implemented
            # (the reference only prints a warning and encodes without
            # them, my_sn/fec/polar/enc.py:262-268; see pc.py). Skipped
            # when they cannot fit the target length (rate would exceed 1).
            n_pc = 3 if (k_target <= 19 and self._enable_pc
                         and k_target + k_crc + 3 <= n_target) else 0
        else:  # downlink
            assert k_target <= 140, "k too large for downlink channel config."
            assert n_target >= 25, "n too small for downlink (24-bit CRC)."
            assert n_target <= 576, "n too large for downlink configuration."
            crc_degree, k_crc = "CRC24C", 24
            n_pc = 0

        k_polar = k_target + k_crc + n_pc
        assert k_polar <= n_target, "k_polar + k_crc + n_pc > n_target."

        # Mother code size (Sec. 5.3.1)
        n_min, n_max = 5, (10 if self._channel_type == "uplink" else 9)
        if (n_target <= (9 / 8) * 2 ** (np.ceil(np.log2(n_target)) - 1)
                and k_polar / n_target < 9 / 16):
            n1 = np.ceil(np.log2(n_target)) - 1
        else:
            n1 = np.ceil(np.log2(n_target))
        n2 = np.ceil(np.log2(8 * k_polar))  # rate >= 1/8
        n_polar = int(2 ** max(min(n1, n2, n_max), n_min))

        # Puncturing / shortening pre-frozen positions (Sec. 5.4.1.1)
        prefrozen = []
        if n_target < n_polar:
            if k_polar / n_target <= 7 / 16:  # puncturing
                n_int = int(32 * np.ceil((n_polar - n_target) / 32))
                pattern = rm.subblock_interleaving(np.arange(n_int))
                prefrozen.extend(int(pattern[i])
                                 for i in range(n_polar - n_target))
                if n_target >= 3 * n_polar / 4:
                    t = int(np.ceil(3 / 4 * n_polar - n_target / 2) - 1)
                else:
                    t = int(np.ceil(9 / 16 * n_polar - n_target / 4) - 1)
                prefrozen.extend(range(t))
            else:  # shortening
                n_int = int(32 * np.ceil(n_polar / 32))
                pattern = rm.subblock_interleaving(np.arange(n_int))
                prefrozen.extend(int(pattern[i])
                                 for i in range(n_target, n_polar))
        prefrozen = np.unique(np.asarray(prefrozen, dtype=np.int64))

        # Reliability-ranked info set minus pre-frozen positions
        # (setdiff1d with assume_unique preserves the reliability order)
        ch_ranking, _ = generate_5g_ranking(0, n_polar, sort=False,
                                            strict=False)
        info_cand = np.setdiff1d(ch_ranking, prefrozen, assume_unique=True)
        if n_pc:
            from polar_tpu.models.polar import pc
            k_with_crc = k_target + k_crc
            wm = pc.n_pc_wm(n_target, k_with_crc)
            info_pos, pc_pos = pc.select_pc_positions(
                info_cand, k_with_crc, n_pc, wm)
            self._pc_pos = pc_pos
        else:
            info_pos = np.sort(info_cand[-k_polar:]).astype(np.int64)
            self._pc_pos = None
        frozen_pos = np.setdiff1d(np.arange(n_polar), info_pos,
                                  assume_unique=True)

        # Downlink input bit interleaver
        if self._channel_type == "downlink":
            ind_input_int = rm.input_interleaver(np.arange(k_polar))
        else:
            ind_input_int = None

        # Combined rate-matching gather: subblock interleave -> circular
        # buffer -> (uplink) channel interleave, fused into one index array.
        ind_sub_int = rm.subblock_interleaving(np.arange(n_polar))
        if n_target >= n_polar:  # repetition
            idx_c_matched = np.mod(np.arange(n_target), n_polar)
        elif k_polar / n_target <= 7 / 16:  # puncturing: keep the tail
            idx_c_matched = np.arange(n_target) + (n_polar - n_target)
        else:  # shortening: keep the head
            idx_c_matched = np.arange(n_target)
        if self._channel_type == "uplink":
            ind_channel_int = rm.channel_interleaver(np.arange(n_target))
            idx_rate_matched = ind_sub_int[idx_c_matched[ind_channel_int]]
        else:
            idx_rate_matched = ind_sub_int[idx_c_matched]

        if self._verbose:
            print(f"Code params after rate-matching: k = {k_target}, n = {n_target}")
            print(f"Polar mother code: k_polar = {k_polar}, n_polar = {n_polar}")
            print(f"Using {crc_degree}")
            print(f"Frozen positions: {frozen_pos}")
            print(f"Channel type: {self._channel_type}")
        return crc_degree, n_polar, frozen_pos, idx_rate_matched, ind_input_int

    def __call__(self, u):
        assert u.shape[-1] == self._k_target, "last dim must be of length k"
        u_crc = self._enc_crc(u)
        if self._channel_type == "downlink":
            u_crc = jnp.take(u_crc, self._ind_input_int, axis=-1)
        if self._pc_pos is not None:
            from polar_tpu.models.polar import pc
            pad = jnp.zeros(u_crc.shape[:-1] + (1,), dtype=u_crc.dtype)
            u0 = jnp.take(jnp.concatenate([u_crc, pad], axis=-1),
                          self._pc_scatter_idx, axis=-1)
            u_full = pc.pc_expand(u0, self._pc_is_data, self._pc_is_pc)
            c = polar_transform(u_full).astype(self.dtype)
        else:
            c = PolarEncoder.__call__(self, u_crc)
        return jnp.take(c, self._ind_rate_matching, axis=-1)
