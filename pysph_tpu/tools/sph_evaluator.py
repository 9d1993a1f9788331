"""Standalone SPH equation evaluation over given particle arrays
(parity with /root/reference/pysph/tools/sph_evaluator.py) — the
post-processing workhorse."""

from pysph_tpu.base.cell_grid import GridSpec
from pysph_tpu.base.kernels import Gaussian
from pysph_tpu.sph.acceleration_eval import AccelerationEval


class SPHEvaluator(object):
    def __init__(self, arrays, equations, dim, kernel=None,
                 domain_manager=None, backend=None, nnps_factory=None):
        self.arrays = arrays
        self.equations = equations
        self.domain_manager = domain_manager
        self.dim = dim
        self.kernel = kernel if kernel is not None else Gaussian(dim=dim)
        self.func_eval = AccelerationEval(
            arrays, equations, self.kernel, backend=backend,
            domain=domain_manager)
        self._create_nnps(arrays)

    def evaluate(self, t=0.0, dt=0.1):
        """Evaluate the equations and write results back to the arrays."""
        import jax
        if not hasattr(self, '_jit_eval') or self._jit_eval is None:
            self._jit_eval = jax.jit(
                lambda t, dt, s: self.func_eval.update_and_compute(
                    t, dt, s))
        states = {}
        for pa in self.arrays:
            states[pa.name], _ = pa.to_device()
        states, diag = self._jit_eval(t, dt, states)
        # iterated groups can grow h and overflow the grid repeatedly
        for _ in range(4):
            if not (bool(diag['cell_overflow']) or
                    bool(diag['extent_overflow']) or
                    bool(diag.get('block_overflow', False)) or
                    bool(diag.get('window_overflow', False))):
                break
            self._create_nnps(self.arrays, grow=True)
            states = {}
            for pa in self.arrays:
                states[pa.name], _ = pa.to_device()
            states, diag = self.func_eval.update_and_compute(t, dt,
                                                             states)
        for pa in self.arrays:
            pa.update_from_device(states[pa.name])

    def update(self, update_domain=True):
        """API parity: binning happens per evaluate(), nothing to do."""
        pass

    def update_particle_arrays(self, arrays):
        self.arrays = arrays
        self.func_eval.particle_arrays = arrays
        self._create_nnps(arrays)

    # Private protocol ###################################################
    def _create_nnps(self, arrays, grow=False):
        spec = GridSpec.from_particles(
            arrays, dim=self.kernel.dim,
            radius_scale=self.kernel.radius_scale,
            domain=self.domain_manager)
        if grow:
            spec = spec.grow(cells=True, extent=True, blocks=True,
                             windows=True)
        self.nnps = spec
        self.func_eval.set_nnps(spec)
        self._jit_eval = None
