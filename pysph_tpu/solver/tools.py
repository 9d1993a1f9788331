"""Solver tools (parity with /root/reference/pysph/solver/tools.py):
the Tool hook ABC, SimpleRemesher and DensityCorrection."""


class Tool(object):
    """A task run on the solver's pre_step/post_step/post_stage hooks
    (reference solver/tools.py:2).  Application also calls
    ``pre_run``/``post_run`` around the solve."""

    def pre_run(self, app):
        pass

    def post_run(self, app):
        pass

    def pre_step(self, solver):
        pass

    def post_stage(self, current_time, dt, stage):
        pass

    def post_step(self, solver):
        pass


class SimpleRemesher(Tool):
    """Periodically remesh an array onto a fixed set of points
    (reference solver/tools.py:35)."""

    def __init__(self, app, array_name, props, freq=100, xi=None,
                 yi=None, zi=None, kernel=None, equations=None):
        from pysph_tpu.solver.utils import get_array_by_name
        self.app = app
        self.particles = app.particles
        self.array = get_array_by_name(self.particles, array_name)
        self.props = props
        if xi is None:
            xi = self.array.x
        if yi is None:
            yi = self.array.y
        if zi is None:
            zi = self.array.z
        self.xi, self.yi, self.zi = xi.copy(), yi.copy(), zi.copy()
        self.freq = freq
        from pysph_tpu.tools.interpolator import Interpolator
        if kernel is None:
            kernel = app.solver.kernel
        self.interp = Interpolator(
            self.particles, x=self.xi, y=self.yi, z=self.zi,
            kernel=kernel, domain_manager=app.create_domain(),
            equations=equations)

    def post_step(self, solver):
        if solver.count % self.freq == 0 and solver.count > 0:
            solver._sync_to_host()
            data = dict(x=self.xi, y=self.yi, z=self.zi)
            for prop in self.props:
                data[prop] = self.interp.interpolate(prop)
            self.array.set(**data)
            solver._sync_to_device()


class DensityCorrection(Tool):
    """Periodic density reinitialization (reference
    solver/tools.py:97)."""

    def __init__(self, app, arr_names, corr='shepard', freq=10,
                 kernel=None):
        from pysph_tpu.solver.utils import get_array_by_name
        self.freq = freq
        self.corr = corr
        self.names = arr_names
        self.count = 1
        self._sph_eval = None
        self.kernel = kernel
        self.dim = app.solver.dim
        self.particles = app.particles
        self.arrs = [get_array_by_name(self.particles, n)
                     for n in self.names]
        options = ('shepard', 'mls2d_1', 'mls3d_1')
        assert self.corr in options, \
            'corr should be one of %s' % (options,)

    def _get_sph_eval(self, corr):
        from pysph_tpu.sph.equation import Group
        from pysph_tpu.sph.wc.density_correction import (
            MLSFirstOrder2D, MLSFirstOrder3D, ShepardFilter)
        from pysph_tpu.tools.sph_evaluator import SPHEvaluator
        if self._sph_eval is not None:
            return self._sph_eval
        cls = {'shepard': ShepardFilter, 'mls2d_1': MLSFirstOrder2D,
               'mls3d_1': MLSFirstOrder3D}[corr]
        eqns = []
        for arr in self.arrs:
            if 'rhotmp' not in arr.properties:
                arr.add_property('rhotmp')
            eqns.append(Group(equations=[cls(arr.name, [arr.name])],
                              real=False))
        kernel = self.kernel(dim=self.dim) if self.kernel else None
        return SPHEvaluator(arrays=self.arrs, equations=eqns,
                            dim=self.dim, kernel=kernel)

    def post_step(self, solver):
        if self.freq == 0:
            return
        if self.count % self.freq == 0:
            self._sph_eval = self._get_sph_eval(self.corr)
            solver._sync_to_host()
            self._sph_eval.evaluate()
            solver._sync_to_device()
        self.count += 1
