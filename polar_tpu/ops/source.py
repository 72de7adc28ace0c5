"""Random binary source (reference ``my_sn/trans/binary_source.py``)."""

import jax
import jax.numpy as jnp


def binary_source(key, shape, dtype=jnp.float32):
    """Uniform i.i.d. bits of the given shape (pure function of ``key``)."""
    return jax.random.bernoulli(key, 0.5, shape).astype(dtype)


class BinarySource:
    """Object wrapper; explicit-key functional style (idiomatic JAX — the
    reference's stateful torch RNG has no place inside ``jit``)."""

    def __init__(self, dtype=jnp.float32):
        self.dtype = dtype

    def __call__(self, key, shape):
        return binary_source(key, shape, self.dtype)
