"""Channel models: AWGN, binary erasure (BEC), binary symmetric (BSC).

Parity with reference ``my_sn/trans/channel/awgn.py`` and
``my_sn/trans/channel/discrete_channel.py``, re-expressed functionally with
explicit PRNG keys. The discrete channels keep the reference's
*differentiable* error sampling (Gumbel-softmax trick, temperature 0.1, with
a straight-through binarizer) so gradients can flow through the channel —
a capability the reference inherits from Sionna.
"""

import jax
import jax.numpy as jnp

from polar_tpu.utils.numerics import expand_to_rank


def complex_normal(key, shape, var=1.0, dtype=jnp.complex64):
    """CN(0, var) samples — each real dimension has variance ``var/2``."""
    kr, ki = jax.random.split(key)
    std = jnp.sqrt(jnp.asarray(var, jnp.float32) / 2.0)
    xr = std * jax.random.normal(kr, shape, dtype=jnp.float32)
    xi = std * jax.random.normal(ki, shape, dtype=jnp.float32)
    return jax.lax.complex(xr, xi).astype(dtype)


class AWGN:
    """``y = x + sqrt(no) * CN(0, 1)`` — complex additive white Gaussian noise."""

    def __call__(self, key, inputs):
        x, no = inputs
        noise = complex_normal(key, x.shape)
        no = expand_to_rank(jnp.asarray(no, jnp.float32), x.ndim, axis=-1)
        return x + noise * jnp.sqrt(no).astype(noise.dtype)


def _ste_binarize(x):
    """Straight-through binarizer: hard threshold forward, identity backward."""
    hard = jnp.where(x < 0.5, 0.0, 1.0)
    return x + jax.lax.stop_gradient(hard - x)


class BinaryMemorylessChannel:
    """Base class for discrete binary channels with differentiable error
    sampling (Gumbel-softmax trick, following the reference
    ``discrete_channel.py:56-75``)."""

    def __init__(self, return_llrs=False, bipolar_input=False, llr_max=100.0,
                 temperature=0.1, eps=1e-9):
        assert llr_max >= 0.0, "llr_max must be a positive scalar value."
        self.return_llrs = return_llrs
        self.bipolar_input = bipolar_input
        self.llr_max = float(llr_max)
        self.temperature = float(temperature)
        self._eps = float(eps)

    def _sample_errors(self, key, pb, shape):
        """Differentiable Bernoulli(pb) error indicators via Gumbel-softmax."""
        u = jax.random.uniform(key, shape + (2,), dtype=jnp.float32)
        q = -jnp.log(-jnp.log(u + self._eps) + self._eps)
        pb = jnp.asarray(pb, jnp.float32)
        p = jnp.stack([pb, 1.0 - pb], axis=-1)
        p = expand_to_rank(p, q.ndim, axis=0)
        a = (jnp.log(p + self._eps) + q) / self.temperature
        e_cat = jax.nn.softmax(a, axis=-1)
        return _ste_binarize(e_cat[..., 0])

    def _check_inputs(self, x):
        # shape/dtype checks happen at trace time; value checks are skipped
        # inside jit (they would force a host sync) — mirrors the reference's
        # one-shot check semantics.
        pass


class BinaryErasureChannel(BinaryMemorylessChannel):
    """Erasure channel. ``__call__(key, (x, pe))``.

    With ``return_llrs=True``: non-erased bits map to ``±llr_max`` logits
    (``llr > 0 -> 1``), erasures to LLR 0. Otherwise ternary outputs with
    erasure marker (-1 for binary inputs, 0 for bipolar).
    """

    def __call__(self, key, inputs):
        # arithmetic in the (straight-through) error indicator, never a
        # boolean `where` on it — gradients must flow through `e` (the
        # differentiable-channel capability, discrete_channel.py:56-75)
        x, pb = inputs
        pb = jnp.clip(jnp.asarray(pb, jnp.float32), 0.0, 1.0)
        e = self._sample_errors(key, pb, x.shape)
        if self.return_llrs:
            v = x if self.bipolar_input else 2.0 * x - 1.0
            return v * self.llr_max * (1.0 - e)  # erasure -> LLR 0
        erased_element = 0.0 if self.bipolar_input else -1.0
        return x * (1.0 - e) + erased_element * e


class BinarySymmetricChannel(BinaryMemorylessChannel):
    """Bit-flip channel with crossover probability ``pb``.

    ``__call__(key, (x, pb))``; with ``return_llrs=True`` outputs scaled
    logits ``±ln((1-pb)/pb)`` (clipped to ``llr_max``).
    """

    def __call__(self, key, inputs):
        x, pb = inputs
        pb = jnp.clip(jnp.asarray(pb, jnp.float32), 0.0, 1.0)
        e = self._sample_errors(key, pb, x.shape)
        if self.bipolar_input:
            y = x * (1.0 - 2.0 * e)
        else:
            y = jnp.abs(x - e)  # XOR for 0/1 inputs, differentiable
        if self.return_llrs:
            scale = jnp.clip(jnp.log((1.0 - pb) / jnp.maximum(pb, self._eps)),
                             -self.llr_max, self.llr_max)
            v = y if self.bipolar_input else 2.0 * y - 1.0
            return scale * v
        return y
