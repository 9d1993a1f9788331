"""pysph_tpu: a TPU-native Smoothed Particle Hydrodynamics framework.

A ground-up re-design of the capabilities of PySPH (pypr/pysph) for TPUs:

- Particle state is a pytree of fixed-capacity padded ``jnp`` arrays.
- Neighbor search is a sorted uniform-grid cell index built with XLA sort,
  queried with a static 9/27-cell stencil into fixed-width neighbor lists.
- The pairwise equation DSL keeps PySPH's contract (``initialize`` /
  ``loop`` / ``post_loop`` / ``reduce`` methods requesting ``d_*`` / ``s_*``
  arrays and precomputed symbols by name) but executes *vectorized*: dest
  reads broadcast ``(N, 1)``, source reads gather ``(N, K)`` and
  ``d_*[d_idx] +=`` becomes a masked sum over the neighbor axis.  There is
  no string code generation: tracing + XLA jit replaces PySPH's
  Cython/OpenCL transpiler.
- Integrators compose jitted stage functions; a whole timestep is one jit.
- Multi-device runs use ``jax.sharding`` + ``shard_map`` with halo exchange
  over static spatial blocks (replacing MPI + Zoltan).
"""

__version__ = '0.1.0'

import os as _os

if _os.environ.get('PYSPH_TPU_PLATFORM'):
    # Select the JAX platform before any backend initializes (e.g.
    # PYSPH_TPU_PLATFORM=cpu runs examples without touching an
    # attached accelerator).
    import jax as _jax
    _jax.config.update('jax_platforms',
                       _os.environ['PYSPH_TPU_PLATFORM'])

from pysph_tpu import config  # noqa
