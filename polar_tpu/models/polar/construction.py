"""Host-side polar code construction (frozen-set selection).

All functions here are pure NumPy and run once at build time; nothing in this
module is traced by JAX. Three constructions, matching the reference:

* ``generate_5g_ranking`` — 5G NR reliability table construction
  (reference ``my_sn/fec/polar/utils.py:6-71``).
* ``generate_rm_code`` — Reed-Muller ``(r, m)`` construction
  (reference ``my_sn/fec/polar/utils.py:73-101``).
* ``get_kern_frozen_bits`` — freeze the lowest-row-weight rows of
  ``kern^{\\otimes s}`` (RM-style reliability proxy; this is what the
  reference's CLI path actually uses, ``x_run_sn_polar/polar/froze.py:4-16``).
"""

import numpy as np

from polar_tpu.models.polar.nr_reliability import NR_RELIABILITY_SEQUENCE


def gen_arikan(base: np.ndarray, layers: int) -> np.ndarray:
    """Kronecker power ``base^{\\otimes layers}`` (host NumPy).

    Parity with reference ``x_run_sn_polar/d_kernels.py:3-7``.
    """
    base = np.asarray(base, dtype=np.int64)
    m = base.copy()
    for _ in range(layers - 1):
        m = np.kron(base, m)
    return m


ARIKAN_F2 = np.array([[1, 0], [1, 1]], dtype=np.int64)


def get_kern_frozen_bits(n: int, f_num: int, kern: np.ndarray = ARIKAN_F2):
    """Freeze the ``f_num`` lowest-row-weight rows of ``kern^{\\otimes s}``.

    Returns ``(G, row_weights, frozen_pos)`` like the reference
    (``x_run_sn_polar/polar/froze.py:4-16``). Ties are broken by position
    (stable argsort), matching ``torch.argsort``'s stable ordering on CPU.
    """
    kern = np.asarray(kern, dtype=np.int64)
    base = kern.shape[0]
    n_stages = int(round(np.log(n) / np.log(base)))
    assert base ** n_stages == n, f"{n=} is not a power of {base=}"
    g = gen_arikan(kern, n_stages)
    weights = g.sum(axis=1)
    frozen_pos = np.sort(np.argsort(weights, kind="stable")[:f_num])
    return g, weights, frozen_pos


def get_ref_rm_frozen_bits(n: int, f_num: int, kern_name: str = "F2"):
    """Reference-EXACT RM frozen set (PARITY.md quirk 3 closure).

    The reference CLI tie-breaks equal row weights with ``torch.argsort``'s
    *unstable* introsort order (``x_run_sn_polar/polar/froze.py:14``), which
    no stable re-implementation can reproduce. The full reliability orders
    were captured by RUNNING the reference (one ``torch.argsort`` of the
    row weights per (kernel, n), all 19 named kernels up to n=1024) and
    shipped as package data ``ref_rm_orders.npz``; the frozen set for any
    rate is the sorted first ``f_num`` entries. Use ``--construction
    rm-ref`` for bit-for-bit CLI-chain replication of the reference;
    ``rm`` (stable ties) is quality-neutral-or-better
    (benchmarks/bler_validation.json)."""
    import os
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "ref_rm_orders.npz")
    key = f"{kern_name}_n{n}"
    with np.load(path) as z:
        if key not in z:
            raise ValueError(
                f"no captured reference order for kernel={kern_name!r} "
                f"n={n} (available: powers of the kernel base up to 1024)")
        order = z[key]
    assert 0 <= f_num <= n
    return np.sort(order[:f_num]).astype(np.int64)


def generate_5g_ranking(k: int, n: int, sort: bool = True, strict: bool = True):
    """Frozen/info positions from the 5G NR reliability table.

    Returns ``[frozen_pos, info_pos]`` — the ``n-k`` least reliable of the
    ``n`` lowest-index channels are frozen (Tab. 5.3.1.2-1 of TS 38.212).
    With ``sort=False`` the arrays are in ascending-reliability order, which
    is what the rate matcher consumes.
    """
    if strict:
        assert k < 1025, "k cannot be larger than 1024."
        assert n < 1025, "n cannot be larger than 1024."
        assert n > 31, "n cannot be smaller than 32."
        assert n >= k, "Invalid coderate (>1)."
        assert np.log2(n) == int(np.log2(n)), "n must be a power of 2."
    # Channels with index >= n do not exist for blocklength n; keep the rest
    # in ascending-reliability order.
    seq = NR_RELIABILITY_SEQUENCE
    ranking_n = seq[seq < n]
    assert ranking_n.shape[0] >= n, "reliability sequence too short"
    ranking_n = ranking_n[:n] if ranking_n.shape[0] > n else ranking_n
    frozen_pos = np.array(ranking_n[: n - k], dtype=np.int64)
    info_pos = np.array(ranking_n[n - k:], dtype=np.int64)
    if sort:
        frozen_pos = np.sort(frozen_pos)
        info_pos = np.sort(info_pos)
    return [frozen_pos, info_pos]


def generate_rm_code(r: int, m: int):
    """Frozen/info positions of the Reed-Muller ``(r, m)`` code.

    Freezes all positions whose index has Hamming weight ``< m - r``.
    Returns ``(frozen_pos, info_pos, n, k, d_min)``.
    """
    assert r <= m, "order r cannot be larger than m."
    n = 2 ** m
    d_min = 2 ** (m - r)
    idx = np.arange(n)
    # popcount of each index
    w = np.zeros(n, dtype=np.int64)
    v = idx.copy()
    while v.any():
        w += v & 1
        v >>= 1
    frozen_mask = w < (m - r)
    frozen_pos = idx[frozen_mask]
    info_pos = idx[~frozen_mask]
    k = int(info_pos.shape[0])
    # closed-form check: k = sum_{i<=r} C(m, i)
    from math import comb

    assert k == sum(comb(m, i) for i in range(r + 1)), "inconsistent k"
    return frozen_pos, info_pos, n, k, d_min


def generate_ga_code(k: int, n: int, design_ebno_db: float = 2.0):
    """AWGN-matched frozen set via density-evolution Gaussian approximation
    (Trifonov 2012) — a construction the reference does not have (its CLI
    uses RM row weights, its 5G path the fixed reliability table).

    The per-bit-channel LLR means are computed by the native C++ recursion
    in ``polar_tpu/native/ga.cpp`` (NumPy fallback). The channel LLR mean
    at the design point is ``m0 = 4 R Eb/N0`` (QPSK-per-dim AWGN with
    exact demap: LLR ~ N(2/No, 4/No), ``No = 1/(2 R Eb/N0)``).

    Returns ``[frozen_pos, info_pos]`` like :func:`generate_5g_ranking`.
    Ties (degenerate at large n where means saturate) break toward
    freezing the lower index, matching the package's stable-argsort rule.
    """
    k = int(k)
    n = int(n)
    assert 0 < k < n and (n & (n - 1)) == 0
    from polar_tpu.native import ga_bit_channel_means
    m0 = 4.0 * (k / n) * 10.0 ** (float(design_ebno_db) / 10.0)
    means = ga_bit_channel_means(n, m0)
    order = np.argsort(means, kind="stable")  # ascending reliability
    frozen_pos = np.sort(order[: n - k])
    info_pos = np.sort(order[n - k:])
    return [frozen_pos, info_pos]


def info_positions(frozen_pos: np.ndarray, n: int) -> np.ndarray:
    """Complement of ``frozen_pos`` in ``range(n)``."""
    return np.setdiff1d(np.arange(n), np.asarray(frozen_pos, dtype=np.int64))
