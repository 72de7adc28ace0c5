"""Gray-labelled QAM constellation, mapper, exact LLR demapper.

Capability parity with reference ``my_sn/trans/mapping.py``: recursive Gray
PAM labelling, unit-power QAM constellations, bit->symbol mapping, and the
exact (log-sum-exp over per-bit index sets) demapper. Constellation tables
and the ``C_{i,0}/C_{i,1}`` index sets are built on host at construction
time; the runtime path is pure fixed-shape JAX (a small gather plus
reductions that XLA fuses with the surrounding chain).

Additions over the reference: a max-log demapping mode (``method="maxlog"``)
— standard Sionna capability, cheaper on TPU for large constellations.
"""

import numpy as np
import jax
import jax.numpy as jnp


def pam_gray(b: np.ndarray):
    """Map a binary vector to a Gray-labelled PAM point in {±1, ±3, ...}."""
    if len(b) > 1:
        return (1 - 2 * b[0]) * (2 ** len(b[1:]) - pam_gray(b[1:]))
    return 1 - 2 * b[0]


def qam(n_bits_per_sym: int, normalize: bool = True) -> np.ndarray:
    """Gray-labelled M-QAM constellation (complex64, host NumPy).

    Bit label of point ``i`` is ``binary_repr(i, n_bits_per_sym)``; even bits
    map the real axis, odd bits the imaginary axis.
    """
    assert n_bits_per_sym % 2 == 0 and n_bits_per_sym > 0, \
        "n_bits_per_sym must be a positive multiple of 2"
    m = 2 ** n_bits_per_sym
    c = np.zeros(m, dtype=np.complex64)
    for i in range(m):
        b = np.array(list(np.binary_repr(i, n_bits_per_sym)), dtype=np.int16)
        c[i] = pam_gray(b[0::2]) + 1j * pam_gray(b[1::2])
    if normalize:
        n = n_bits_per_sym // 2
        qam_var = 1 / (2 ** (n - 2)) * np.sum(
            np.linspace(1, 2 ** n - 1, 2 ** (n - 1)) ** 2)
        c /= np.sqrt(qam_var)
    return c


class Constellation:
    """A (possibly normalized) QAM constellation usable by (de)mappers."""

    def __init__(self, n_bits_per_sym: int, normalize: bool = True,
                 dtype=jnp.complex64):
        assert n_bits_per_sym % 1 == 0 and int(n_bits_per_sym) % 2 == 0 and \
            n_bits_per_sym > 0, "n_bits_per_sym must be a positive even int"
        self.n_bits_per_sym = int(n_bits_per_sym)
        self.normalize = normalize
        self.dtype = dtype
        pts = qam(self.n_bits_per_sym, normalize=normalize)
        if normalize:
            pts = pts / np.sqrt(np.mean(np.abs(pts) ** 2))
        self._points_np = pts.astype(np.complex64)
        self._points = self._points_np

    @property
    def points(self):
        return self._points

    def __call__(self):
        return self._points

    def show(self, labels: bool = True, figsize=(7, 7)):
        """Scatter plot of the constellation (host-side, matplotlib)."""
        import matplotlib.pyplot as plt

        pts = self._points_np
        maxval = np.max(np.abs(pts)) * 1.05
        fig = plt.figure(figsize=figsize)
        ax = fig.add_subplot(111)
        plt.xlim(-maxval, maxval)
        plt.ylim(-maxval, maxval)
        plt.scatter(np.real(pts), np.imag(pts))
        ax.set_aspect("equal", adjustable="box")
        plt.xlabel("Real Part")
        plt.ylabel("Imaginary Part")
        plt.grid(True, which="both", axis="both")
        plt.title("Constellation Plot")
        if labels:
            for j, p in enumerate(pts):
                plt.annotate(np.binary_repr(j, self.n_bits_per_sym),
                             (np.real(p), np.imag(p)))
        return fig


# Reference-compatible alias (``my_sn/trans/mapping.py:49``).
QamConstell = Constellation


class Mapper:
    """Maps bit tensors ``[..., n]`` to constellation symbols
    ``[..., n / n_bits_per_sym]``."""

    def __init__(self, constell: Constellation, return_indices: bool = False):
        self.constell = constell
        self.return_indices = return_indices
        m = constell.n_bits_per_sym
        self._binary_base = (2 ** np.arange(m - 1, -1, -1)).astype(np.int32)

    def __call__(self, bits):
        m = self.constell.n_bits_per_sym
        assert bits.shape[-1] % m == 0, \
            "last dim must be a multiple of n_bits_per_sym"
        groups = bits.reshape(bits.shape[:-1] + (bits.shape[-1] // m, m))
        idx = jnp.sum(groups.astype(jnp.int32) * self._binary_base, axis=-1)
        x = jnp.take(self.constell.points, idx, axis=0)
        if self.return_indices:
            return x, idx
        return x


class SymbolLogits2LLRs:
    """Per-bit LLRs from logits on constellation points.

    ``LLR(i) = logsumexp_{c in C_{i,1}} z_c - logsumexp_{c in C_{i,0}} z_c``
    (sionna logit convention: positive LLR means bit = 1).
    """

    def __init__(self, n_bits_per_sym: int, method: str = "app"):
        assert method in ("app", "maxlog")
        self.n_bits_per_sym = int(n_bits_per_sym)
        self.method = method
        n_points = 2 ** self.n_bits_per_sym
        labels = np.zeros((n_points, self.n_bits_per_sym), dtype=np.int64)
        for i in range(n_points):
            labels[i] = np.array(list(np.binary_repr(i, self.n_bits_per_sym)),
                                 dtype=np.int64)
        c0 = np.stack([np.where(labels[:, i] == 0)[0]
                       for i in range(self.n_bits_per_sym)], axis=1)
        c1 = np.stack([np.where(labels[:, i] == 1)[0]
                       for i in range(self.n_bits_per_sym)], axis=1)
        self._c0 = c0  # [n_points/2, n_bits]
        self._c1 = c1

    def __call__(self, logits):
        # logits: [..., n_sym, n_points]
        exp0 = logits[..., self._c0]  # [..., n_sym, n_points/2, n_bits]
        exp1 = logits[..., self._c1]
        if self.method == "app":
            return (jax.scipy.special.logsumexp(exp1, axis=-2)
                    - jax.scipy.special.logsumexp(exp0, axis=-2))
        return jnp.max(exp1, axis=-2) - jnp.max(exp0, axis=-2)


class Demapper:
    """Exact (or max-log) bit LLRs from received symbols.

    ``__call__((y, no)) -> llr[..., n_sym * n_bits_per_sym]`` with the
    logit convention ``llr > 0 -> bit 1``.
    """

    def __init__(self, constell: Constellation, method: str = "app"):
        self.constell = constell
        self._logits2llrs = SymbolLogits2LLRs(constell.n_bits_per_sym, method)

    def __call__(self, inputs):
        y, no = inputs
        no = jnp.asarray(no, dtype=jnp.float32)
        if self.constell.n_bits_per_sym == 2 and self.constell.normalize:
            # Gray QPSK factorizes per axis, so the exact (APP) LLR has a
            # closed form: points are (+-a) + 1j(+-a) with a = 1/sqrt(2),
            # bit0 on the real axis (label 1 -> -a) and bit1 on the
            # imaginary axis, hence llr_logit(b) = -4a*Re(y)/No (resp. Im).
            # Identical to the logsumexp path (the cross terms cancel) at a
            # fraction of the ops — this is the reference chain's hot path.
            a = float(np.sqrt(0.5))
            scale = -4.0 * a / no
            llr = jnp.stack([scale * y.real, scale * y.imag], axis=-1)
            return llr.reshape(y.shape[:-1] + (2 * y.shape[-1],))
        points = self.constell.points.reshape(
            (1,) * y.ndim + self.constell.points.shape)
        squared_dist = jnp.abs(y[..., None] - points) ** 2
        exponents = -squared_dist / no
        llr = self._logits2llrs(exponents)
        out_shape = y.shape[:-1] + (y.shape[-1] * self.constell.n_bits_per_sym,)
        return llr.reshape(out_shape)
