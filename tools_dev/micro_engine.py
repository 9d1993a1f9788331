"""Bisect the real engine's DMA floor: mock _pair_kernel_compact's
grid spec at dam_break_3d shapes with a no-compute kernel, then peel
features off."""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def force(x):
    return np.asarray(x.reshape(-1)[:1])


def bench(label, A_max, tz, Md, n_src, Ms, Pp, Pd, n_sblocks,
          dyn_maps=True, n_views=9, scratch=True, when_gate=True):
    B = 4416
    fdt = jnp.float32
    d_pack = jnp.ones((A_max, 2 + Pd, tz, Md), fdt)
    s_packs = [jnp.ones((n_sblocks + 1, Pp, tz, 3 * Ms), fdt)
               for _ in range(n_src)]
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.permutation(B)[:A_max].astype(np.int32))
    ny, n_zt = 23, 3
    bi = ids // (ny * n_zt)
    bj = (ids // n_zt) % ny
    bz = ids % n_zt
    na = jnp.asarray([A_max], jnp.int32)
    invs = [jnp.asarray(
        rng.randint(0, n_sblocks + 1, B).astype(np.int32))
        for _ in range(n_src)]
    nx = 64

    offs = [(oy, ox) for oy in (-1, 0, 1) for ox in (-1, 0, 1)]
    offs = offs[:n_views]

    def smap(a, bi_, bj_, bz_, na_, *inv, ox=0, oy=0, si=0):
        i2 = jnp.clip(bi_[a] + ox, 0, nx - 1)
        j2 = jnp.clip(bj_[a] + oy, 0, ny - 1)
        flat = (i2 * ny + j2) * n_zt + bz_[a]
        return (inv[si][flat], 0, 0, 0)

    def smap_static(a, bi_, bj_, bz_, na_, *inv, ox=0, oy=0, si=0):
        return ((a * 7 + ox * 3 + oy + si) % n_sblocks, 0, 0, 0)

    dest_map = lambda a, *r: (a, 0, 0, 0)  # noqa: E731

    ins = [d_pack]
    in_specs = [pl.BlockSpec((1, 2 + Pd, tz, Md), dest_map)]
    for si in range(n_src):
        for oy, ox in offs:
            ins.append(s_packs[si])
            in_specs.append(pl.BlockSpec(
                (1, Pp, tz, 3 * Ms),
                functools.partial(smap if dyn_maps else smap_static,
                                  ox=ox, oy=oy, si=si)))
    Po = 5
    out_spec = pl.BlockSpec((1, Po, tz, Md), dest_map)
    out_shape = jax.ShapeDtypeStruct((A_max, Po, tz, Md), fdt)

    def kern(*refs):
        it = iter(refs)
        bi_r = next(it)
        bj_r = next(it)
        bz_r = next(it)
        na_r = next(it)
        for _ in range(n_src):
            next(it)
        d_ref = next(it)
        s_refs = [next(it) for _ in range(n_src * len(offs))]
        out_ref = next(it)
        scr = [next(it) for _ in range(Po)] if scratch else None
        a = pl.program_id(0)
        valid = a < na_r[0]

        def _body():
            acc = jnp.zeros((tz, Md), fdt)
            for r in s_refs:
                acc = acc + jnp.sum(r[0, 0], axis=-1, keepdims=True)
            if scratch:
                for po in range(Po):
                    scr[po][...] = acc
                for po in range(Po):
                    out_ref[0, po] = scr[po][...]
            else:
                for po in range(Po):
                    out_ref[0, po] = acc

        if when_gate:
            pl.when(valid)(_body)
        else:
            _body()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4 + n_src, grid=(A_max,),
        in_specs=in_specs, out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((tz, Md), fdt)
                        for _ in range(Po)] if scratch else [])

    K = 10

    @jax.jit
    def f(d):
        def body(c, _):
            out = pl.pallas_call(
                kern, grid_spec=grid_spec, out_shape=out_shape)(
                    bi, bj, bz, na, *invs, c, *ins[1:])
            return c + jnp.mean(out) * 1e-9, 0
        c, _ = jax.lax.scan(body, d, None, length=K)
        return c

    out = f(d_pack)
    force(out)
    t0 = time.time()
    for _ in range(5):
        out = f(d_pack)
    force(out)
    t = (time.time() - t0) / 5 / K * 1e3
    bytes_in = (A_max * (2 + Pd) * tz * Md +
                A_max * n_src * len(offs) * Pp * tz * 3 * Ms) * 4
    print('%-44s %7.3f ms (%4.1f us/prog, %4.0f GB/s)' %
          (label, t, t / A_max * 1e3, bytes_in / t / 1e6), flush=True)


CASES = {
    'fluid-full': ('fluid-like full', 748, 8, 32, 3, 32, 12, 11, 748,
                   {}),
    'fluid-static': ('fluid-like static maps', 748, 8, 32, 3, 32, 12,
                     11, 748, {'dyn_maps': False}),
    'fluid-noscratch': ('fluid-like no scratch', 748, 8, 32, 3, 32,
                        12, 11, 748, {'scratch': False}),
    'fluid-1src': ('fluid-like 1 src', 748, 8, 32, 1, 32, 12, 11,
                   748, {}),
    'fluid-3views': ('fluid-like 3 views', 748, 8, 32, 3, 32, 12, 11,
                     748, {'n_views': 3}),
    'boundary-full': ('boundary-like full', 2519, 8, 32, 1, 32, 11,
                      9, 748, {}),
    'obstacle-full': ('obstacle-like full', 283, 8, 32, 1, 32, 11, 9,
                      748, {}),
}

if __name__ == '__main__':
    if len(sys.argv) > 1:
        args = CASES[sys.argv[1]]
        bench(*args[:-1], **args[-1])
    else:
        import subprocess
        for key in CASES:
            r = subprocess.run(
                [sys.executable, __file__, key], capture_output=True,
                text=True, timeout=300)
            out = [l for l in (r.stdout or '').splitlines()
                   if 'ms (' in l]
            print(out[0] if out else
                  '%s FAILED: %s' % (key, (r.stderr or '')[-300:]),
                  flush=True)
