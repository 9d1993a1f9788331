"""Micro-bench: pallas program launch overhead + per-descriptor DMA
cost on the attached chip."""
import os
import sys
import time
import functools

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def force(x):
    return np.asarray(x.reshape(-1)[:1])


def bench(n_programs, n_views, tz, lanes, planes, n_blocks=512,
          label=''):
    """Kernel with `n_views` input views of (planes, tz, lanes) per
    program, indexed pseudo-randomly over n_blocks; writes one small
    output block."""
    src = jnp.ones((n_blocks, planes, tz, lanes), jnp.float32)

    def imap(a, v=0):
        return ((a * 7 + v * 3) % n_blocks, 0, 0, 0)

    in_specs = [pl.BlockSpec((1, planes, tz, lanes),
                             functools.partial(imap, v=v))
                for v in range(n_views)]
    out_spec = pl.BlockSpec((1, 1, tz, 8), lambda a: (a, 0, 0, 0))
    out_shape = jax.ShapeDtypeStruct((n_programs, 1, tz, 8),
                                     jnp.float32)

    def kern(*refs):
        outr = refs[-1]
        acc = jnp.zeros((tz, 8), jnp.float32)
        for v in range(n_views):
            acc = acc + jnp.sum(refs[v][0], axis=0)[:, :8]
        outr[0, 0] = acc

    K = 10

    @jax.jit
    def f(s):
        def body(c, _):
            out = pl.pallas_call(
                kern, grid=(n_programs,), in_specs=in_specs,
                out_specs=out_spec, out_shape=out_shape)(
                    *([c] * n_views))
            # feed output back so iterations can't be parallelized
            c = c + jnp.mean(out) * 1e-9
            return c, 0
        c, _ = jax.lax.scan(body, s, None, length=K)
        return c

    out = f(src)
    force(out)
    t0 = time.time()
    for _ in range(5):
        out = f(src)
    force(out)
    t = (time.time() - t0) / 5 / K * 1e3
    bytes_in = n_programs * n_views * planes * tz * lanes * 4
    print('%-36s %7.3f ms  (%5.1f us/prog, %4.2f us/desc, '
          '%.0f GB/s)' %
          (label or '%d progs x %d views' % (n_programs, n_views),
           t, t / n_programs * 1e3,
           t / (n_programs * n_views) * 1e3,
           bytes_in / t / 1e6), flush=True)


if __name__ == '__main__':
    print(jax.devices())
    # pure launch: 1 tiny view
    bench(512, 1, 8, 128, 1, label='512 progs, 1 tiny view')
    bench(3550, 1, 8, 128, 1, label='3550 progs, 1 tiny view')
    # descriptor scaling at fluid-phase-like shapes
    bench(748, 9, 8, 384, 12, label='748p 9v (ff-like)')
    bench(748, 27, 8, 384, 12, label='748p 27v (fluid dest phase)')
    bench(748, 3, 8, 1152, 12, label='748p 3v wide (same bytes)')
    bench(748, 1, 8, 3456, 12, label='748p 1v very wide')
    bench(2519, 9, 8, 384, 11, label='2519p 9v (boundary dest)')
    bench(2519, 9, 24, 384, 11, label='2519p 9v tz=24 (3x bytes)')
    bench(840, 9, 24, 384, 11, label='840p 9v tz=24 (same bytes)')
