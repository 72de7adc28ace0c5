"""Small tensor utilities (parity with reference ``my_sn/utils.py`` and
``my_sn/fec/utils.py``), expressed in JAX."""

import jax.numpy as jnp


def int_mod_2(x):
    """``x % 2`` via a bitwise AND on an int32 view.

    Capability parity with reference ``my_sn/fec/utils.py:2-13`` (which avoids
    ``tf.mod``'s CPU placement); on TPU a bitwise AND also lowers to a single
    cheap VPU op and avoids an integer division.
    """
    return (x.astype(jnp.int32) & 1).astype(x.dtype)


def insert_dims(x, num_dims, axis=-1):
    """Insert ``num_dims`` length-one axes starting at ``axis``.

    Parity with reference ``my_sn/utils.py:40-58``.
    """
    assert num_dims >= 0, "`num_dims` must be nonnegative."
    rank = x.ndim
    assert -(rank + 1) <= axis <= rank, "`axis` out of range"
    axis = axis if axis >= 0 else rank + axis + 1
    new_shape = list(x.shape[:axis]) + [1] * num_dims + list(x.shape[axis:])
    return x.reshape(new_shape)


def expand_to_rank(x, target_rank, axis=-1):
    """Insert length-one axes at ``axis`` until ``x`` has rank ``target_rank``.

    Parity with reference ``my_sn/utils.py:19-39``.
    """
    x = jnp.asarray(x)
    return insert_dims(x, max(target_rank - x.ndim, 0), axis)
