"""Rectangular open-channel SWE flow with inlet/outlet open
boundaries, bed friction (Manning) and Riemann-invariant
sub-critical in/outflow conditions (parity case for
/root/reference/pysph/examples/shallow_water/
rectangular_channel_flow.py)."""

import os

import numpy as np
from numpy import ones_like, savez, sqrt, zeros_like

from pysph_tpu.base.kernels import CubicSpline
from pysph_tpu.base.utils import get_particle_array_swe as gpa_swe
from pysph_tpu.solver.application import Application
from pysph_tpu.solver.solver import Solver
from pysph_tpu.sph.bc.donothing.simple_inlet_outlet import (
    SimpleInletOutlet)
from pysph_tpu.sph.bc.inlet_outlet_manager import (InletInfo,
                                                   InletStep,
                                                   OutletInfo,
                                                   OutletStep)
from pysph_tpu.sph.equation import Group
from pysph_tpu.sph.swe.basic import (
    BedFrictionSourceEval, BoundaryInnerReimannStateEval,
    CheckConvergenceDensityResidual,
    CorrectionFactorVariableSmoothingLength,
    GatherDensityEvalNextIteration, NonDimensionalDensityResidual,
    ParticleAcceleration, SubCriticalInFlow, SubCriticalOutFlow,
    SWEIntegrator, SWEOS, SWEStep, UpdateSmoothingLength)
from pysph_tpu.tools.sph_evaluator import SPHEvaluator

rho_w = 1000.0
g = 9.81
dim = 2

BOUNDARY_PROPS = ['dw_inner_reimann', 'u_inner_reimann',
                  'v_inner_reimann', 'shep_corr']


class RectangularOpenChannelFlow(Application):
    def add_user_options(self, group):
        group.add_argument('--hdx', action='store', type=float,
                           dest='hdx', default=1.2)
        group.add_argument('--dx', action='store', type=float,
                           dest='dx', default=10.0,
                           help='Particle spacing')
        group.add_argument('--dw0', action='store', type=float,
                           dest='dw0', default=5.0,
                           help='Initial depth (m)')
        group.add_argument('--le', action='store', type=float,
                           dest='le', default=800.0,
                           help='Channel length (m)')
        group.add_argument('--w', action='store', type=float,
                           dest='w', default=400.0,
                           help='Channel width (m)')
        group.add_argument('--n', action='store', type=float,
                           dest='n', default=0.0316,
                           help='Manning coefficient')

    def consume_user_options(self):
        o = self.options
        self.hdx, self.dx = o.hdx, o.dx
        self.dw0, self.le, self.w, self.n = o.dw0, o.le, o.w, o.n
        self.num_inlet_pa = 2
        self.num_outlet_pa = 3
        self.x_max_inlet = 0.0
        self.x_min_inlet = -self.dx * self.num_inlet_pa
        self.x_min_outlet = self.le
        self.x_max_outlet = self.le + self.num_outlet_pa * self.dx
        q = 14.645  # specific discharge
        self.u_inlet = q / self.dw0

    def create_particles(self):
        hdx, dx = self.hdx, self.dx
        d, w, le = self.dw0, self.w, self.le
        u_inlet = self.u_inlet

        x, y = np.mgrid[-self.num_inlet_pa * dx + dx / 2.0:0:dx,
                        dx / 2:w - dx / 4.0:dx]
        x, y = x.ravel(), y.ravel()
        rho = ones_like(x) * rho_w * d
        inlet = gpa_swe(
            x=x, y=y, m=dx * dx * rho_w * d, rho0=rho.copy(),
            rho=rho, h0=hdx * dx, h=hdx * dx, u=u_inlet, uh=u_inlet,
            alpha=dim * rho, cs=sqrt(9.8 * rho / rho_w), bx=-0.001,
            name='inlet')
        inlet.add_output_arrays(BOUNDARY_PROPS)
        inlet.add_property('x0')

        xf, yf = np.mgrid[0.5 * dx:self.x_max_inlet + le:dx,
                          dx / 2:w - dx / 4.0:dx]
        xf, yf = xf.ravel(), yf.ravel()
        rho = ones_like(xf) * rho_w * d
        fluid = gpa_swe(
            name='fluid', x=xf, y=yf, m=dx * dx * rho_w * d,
            rho0=rho.copy(), rho=rho, h=hdx * dx, bx=-0.001,
            h0=hdx * dx, uh=u_inlet, u=u_inlet)

        xo, yo = np.mgrid[dx / 2.0:self.num_outlet_pa * dx:dx,
                          dx / 2:w - dx / 4.0:dx]
        xo, yo = xo.ravel() + le, yo.ravel()
        rho = ones_like(xo) * rho_w * d
        outlet = gpa_swe(
            name='outlet', x=xo, y=yo, dw=d, m=dx * dx * rho_w * d,
            rho0=rho.copy(), alpha=dim * rho, rho=rho, h=hdx * dx,
            h0=hdx * dx, cs=sqrt(9.8 * rho / rho_w))
        outlet.add_output_arrays(BOUNDARY_PROPS)
        outlet.add_property('x0')

        xb, yb = np.mgrid[-5 * dx:le * 1.6 + 5 * dx:dx,
                          0:w + dx / 2.0:dx]
        xb, yb = xb.ravel(), yb.ravel()
        bed = gpa_swe(name='bed', x=xb, y=yb, V=dx * dx, n=self.n,
                      h=hdx * dx)

        xcb = np.arange(self.x_min_inlet - 2.0 * dx,
                        self.x_max_outlet * 1.6, dx)
        ycb_top = np.concatenate((ones_like(xcb) * (w + 0.5 * dx),
                                  ones_like(xcb) * (w + 1.5 * dx)))
        ycb_bot = np.concatenate((zeros_like(xcb) - 0.5 * dx,
                                  zeros_like(xcb) - 1.5 * dx))
        xcb_all = np.concatenate((np.tile(xcb, 2), np.tile(xcb, 2)))
        ycb_all = np.concatenate((ycb_top, ycb_bot))
        rho_cb = ones_like(xcb_all) * rho_w * d
        dw_cb = ones_like(xcb_all) * d
        boundary = gpa_swe(
            name='boundary', x=xcb_all, y=ycb_all,
            m=dx * dx * rho_w * d, h=hdx * dx, rho=rho_cb, dw=dw_cb,
            cs=sqrt(9.8 * dw_cb), alpha=dim * rho_cb, u=u_inlet,
            is_wall_boun_pa=ones_like(xcb_all))
        return [inlet, fluid, outlet, bed, boundary]

    def _create_inlet_outlet_manager(self):
        from pysph_tpu.sph.bc.donothing.inlet import Inlet
        from pysph_tpu.sph.bc.donothing.outlet import Outlet
        props_to_copy = ['x', 'y', 'u', 'v', 'w', 'm', 'h', 'rho',
                         'rho0', 'bx', 'h0', 'uh']
        inlet_info = InletInfo(
            pa_name='inlet', normal=[-1.0, 0.0, 0.0],
            refpoint=[self.x_min_inlet, 0.0, 0.0], has_ghost=False,
            update_cls=Inlet)
        outlet_info = OutletInfo(
            pa_name='outlet', normal=[1.0, 0.0, 0.0],
            refpoint=[self.x_max_outlet, 0.0, 0.0],
            update_cls=Outlet, props_to_copy=props_to_copy)
        return SimpleInletOutlet(
            fluid_arrays=['fluid'], inletinfo=[inlet_info],
            outletinfo=[outlet_info])

    def create_inlet_outlet(self, particle_arrays):
        compute_initial_props(list(particle_arrays.values()))
        return self.iom.get_inlet_outlet(particle_arrays)

    def create_solver(self):
        self.iom = self._create_inlet_outlet_manager()
        kernel = CubicSpline(dim=2)
        integrator = SWEIntegrator(inlet=InletStep(), fluid=SWEStep(),
                                   outlet=OutletStep())
        return Solver(kernel=kernel, dim=2, integrator=integrator,
                      cfl=0.1, adaptive_timestep=True, tf=100)

    def create_equations(self):
        return [
            Group(equations=[
                GatherDensityEvalNextIteration(
                    dest='fluid',
                    sources=['inlet', 'fluid', 'outlet', 'boundary']),
                NonDimensionalDensityResidual(dest='fluid'),
                UpdateSmoothingLength(dim=dim, dest='fluid'),
                CheckConvergenceDensityResidual(dest='fluid'),
            ], iterate=True, max_iterations=10),
            Group(equations=[
                CorrectionFactorVariableSmoothingLength(
                    dest='fluid',
                    sources=['fluid', 'inlet', 'outlet', 'boundary']),
                SWEOS(dest='fluid'),
            ]),
            Group(equations=[
                BoundaryInnerReimannStateEval(dest='inlet',
                                              sources=['fluid']),
                BoundaryInnerReimannStateEval(dest='outlet',
                                              sources=['fluid']),
            ]),
            Group(equations=[
                SubCriticalInFlow(dest='inlet'),
                SubCriticalOutFlow(dest='outlet'),
            ]),
            Group(equations=[
                BedFrictionSourceEval(dest='fluid',
                                      sources=['bed'])]),
            Group(equations=[
                ParticleAcceleration(
                    dim=dim, dest='fluid',
                    sources=['fluid', 'inlet', 'outlet',
                             'boundary'])]),
        ]

    def post_step(self, solver):
        for pa in self.particles:
            if pa.name == 'outlet':
                o_pa = pa
        arr_ones = ones_like(np.asarray(o_pa.rho))
        o_pa.alpha = arr_ones * dim * rho_w * self.dw0
        o_pa.rho = arr_ones * rho_w * self.dw0
        o_pa.dw = arr_ones * self.dw0
        o_pa.cs = sqrt(9.8 * np.asarray(o_pa.dw))

    def post_process(self, info_fname):
        if len(self.output_files) == 0:
            return
        from pysph_tpu.solver.output import load
        data = load(self.output_files[-1])
        fluid = data['arrays']['fluid']
        t = data['solver_data']['t']
        fname_res = os.path.join(self.output_dir, 'results.npz')
        savez(fname_res, t=t, x=np.asarray(fluid.x),
              y=np.asarray(fluid.y), dw=np.asarray(fluid.dw),
              u=np.asarray(fluid.u))


def compute_initial_props(particles):
    one_time_equations = [
        Group(equations=[SWEOS(dest='fluid')]),
        Group(equations=[
            BoundaryInnerReimannStateEval(dest='inlet',
                                          sources=['fluid']),
            BoundaryInnerReimannStateEval(dest='outlet',
                                          sources=['fluid']),
        ]),
        Group(equations=[
            SubCriticalInFlow(dest='inlet'),
            SubCriticalOutFlow(dest='outlet'),
        ]),
    ]
    SPHEvaluator(particles, one_time_equations, dim=2,
                 kernel=CubicSpline(dim=2)).evaluate()


if __name__ == '__main__':
    app = RectangularOpenChannelFlow()
    app.run()
    app.post_process(app.info_filename)
