"""Array reductions usable inside ``reduce`` methods (parity with
/root/reference/pysph/base/reduce_array.py).

On device the ops are jnp reductions; ``parallel_reduce_array`` is
the cross-shard version — inside ``shard_map`` it lowers to the
matching collective over the block axis, outside it equals the serial
reduction (single chip)."""

import jax.numpy as jnp


def _check_operation(op):
    valid_ops = ('sum', 'max', 'min', 'prod')
    if op not in valid_ops:
        raise RuntimeError('Unsupported operation %s, must be one of '
                           '%s.' % (op, valid_ops))


_OPS = {'sum': jnp.sum, 'prod': jnp.prod, 'max': jnp.max,
        'min': jnp.min}


def serial_reduce_array(array, op='sum'):
    """(reference reduce_array.py:25)"""
    _check_operation(op)
    return _OPS[op](jnp.asarray(array))


def dummy_reduce_array(array, op='sum'):
    """(reference reduce_array.py:37)"""
    return jnp.asarray(array)


def parallel_reduce_array(value, op='sum', axis_name='blocks'):
    """Cross-shard allreduce of an already serially-reduced value.

    Inside ``shard_map(..., axis_names=(axis_name,))`` this emits the
    XLA collective (psum/pmax/pmin); otherwise it is the identity,
    matching the reference's serial fallback."""
    _check_operation(op)
    import jax
    try:
        if op == 'sum':
            return jax.lax.psum(value, axis_name)
        if op == 'max':
            return jax.lax.pmax(value, axis_name)
        if op == 'min':
            return jax.lax.pmin(value, axis_name)
        return jnp.exp(jax.lax.psum(jnp.log(value), axis_name))
    except NameError:
        return value
