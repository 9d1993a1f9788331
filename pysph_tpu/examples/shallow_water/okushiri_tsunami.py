"""Okushiri (Monai Valley) tsunami benchmark: the 1/400-scale wave
tank of the 1993 Hokkaido-Nansei-Oki tsunami with measured
bathymetry and a time-varying inflow depth (parity case for
/root/reference/pysph/examples/shallow_water/okushiri_tsunami.py).

The run needs the benchmark input files (``tsunami_obc.txt`` with the
inflow depth series and ``tsunami_bed.txt.bz2`` with the bathymetry
samples) in ``okushiri_tsunami_input_files/`` next to this script or
in the directory passed with ``--input-dir``; they come from the NOAA
Monai Valley benchmark distribution."""

import os

import numpy as np
from numpy import (arange, concatenate, loadtxt, mgrid, ones_like,
                   ravel, savez, sqrt, where, zeros, zeros_like)

from pysph_tpu.base.kernels import CubicSpline
from pysph_tpu.base.utils import get_particle_array_swe as gpa_swe
from pysph_tpu.solver.application import Application
from pysph_tpu.solver.solver import Solver
from pysph_tpu.sph.equation import Group
from pysph_tpu.sph.swe.basic import (
    BedCurvature, BedFrictionSourceEval, BedGradient,
    BoundaryInnerReimannStateEval, CheckConvergenceDensityResidual,
    CorrectionFactorVariableSmoothingLength, FluidBottomCurvature,
    FluidBottomElevation, FluidBottomGradient,
    GatherDensityEvalNextIteration, GradientCorrection,
    GradientCorrectionPreStep, NonDimensionalDensityResidual,
    ParticleAcceleration, RemoveCloseParticlesAtOpenBoundary,
    RemoveFluidParticlesWithNoNeighbors, RemoveOutofDomainParticles,
    RemoveParticlesWithZeroAlpha, SubCriticalTimeVaryingOutFlow,
    SWEInlet, SWEInletOutletStep, SWEIntegrator, SWEOS, SWEStep,
    UpdateSmoothingLength)
from pysph_tpu.tools.sph_evaluator import SPHEvaluator

rho_w = 1000.0
g = 9.81
dim = 2

BOUNDARY_PROPS = ['dw_inner_reimann', 'u_inner_reimann',
                  'v_inner_reimann', 'shep_corr']


class OkushiriTsunami(Application):
    def add_user_options(self, group):
        group.add_argument('--hdx', action='store', type=float,
                           dest='hdx', default=1.2)
        group.add_argument('--dx', action='store', type=float,
                           dest='dx', default=0.01875,
                           help='Particle spacing')
        group.add_argument('--dw0', action='store', type=float,
                           dest='dw0', default=0.13535,
                           help='Initial depth (m)')
        group.add_argument('--le', action='store', type=float,
                           dest='le', default=5.448,
                           help='Domain length (m)')
        group.add_argument('--w', action='store', type=float,
                           dest='w', default=3.402,
                           help='Domain width (m)')
        group.add_argument('--n', action='store', type=float,
                           dest='n', default=0.025,
                           help='Manning coefficient')
        group.add_argument('--Vb', action='store', type=float,
                           dest='Vb', default=1.96e-4,
                           help='Bed particle volume')
        group.add_argument('--hb', action='store', type=float,
                           dest='hb', default=1.68e-2,
                           help='Bed particle smoothing length')
        group.add_argument(
            '--input-dir', action='store', dest='input_dir',
            default=os.path.join(
                os.path.dirname(os.path.realpath(__file__)),
                'okushiri_tsunami_input_files'),
            help='Directory with tsunami_obc.txt / '
                 'tsunami_bed.txt.bz2 (NOAA Monai Valley benchmark)')

    def consume_user_options(self):
        o = self.options
        self.hdx, self.dx, self.dw0 = o.hdx, o.dx, o.dw0
        self.le, self.w, self.n = o.le, o.w, o.n
        self.Vb, self.hb = o.Vb, o.hb
        self.num_inlet_pa = 2
        self.x_max_inlet = 0
        self.x_min_inlet = -0.95 * self.dx * self.num_inlet_pa
        self.min_dist_ob = self.dx / 2.0
        self.dir_input_files = o.input_dir
        obc_fname = os.path.join(self.dir_input_files,
                                 'tsunami_obc.txt')
        if not os.path.exists(obc_fname):
            raise RuntimeError(
                'Okushiri benchmark input %r not found: download the '
                'NOAA Monai Valley benchmark files and pass '
                '--input-dir.' % obc_fname)
        self.t_ob, self.dw_ob = loadtxt(obc_fname, delimiter=' ',
                                        unpack=True)

    def create_particles(self):
        hdx, dx, d = self.hdx, self.dx, self.dw0
        w = self.w
        l_domain = self.le

        y = arange(dx / 2, w - dx / 4.0, dx)
        x = zeros_like(y) - 0.5 * dx
        rho = ones_like(x) * rho_w * d
        inlet = gpa_swe(
            x=x, y=y, m=dx * dx * rho_w * d, rho0=rho.copy(),
            rho=rho, h0=hdx * dx, h=hdx * dx, dw_at_t=d,
            alpha=dim * rho, cs=sqrt(9.8 * rho / rho_w),
            name='inlet')
        inlet.add_output_arrays(BOUNDARY_PROPS)

        bed_fname = os.path.join(self.dir_input_files,
                                 'tsunami_bed.txt.bz2')
        xb, yb, b = loadtxt(bed_fname, delimiter=' ', unpack=True)
        bed = gpa_swe(name='bed', x=xb, y=yb, V=self.Vb, n=self.n,
                      h=self.hb, b=b)
        bed.add_property('m_mat', stride=9)

        xf, yf = mgrid[0.5 * dx:self.x_max_inlet + l_domain:dx,
                       dx / 2:w - dx / 4.0:dx]
        xf, yf = ravel(xf), ravel(yf)
        fluid = gpa_swe(name='fluid', x=xf, y=yf, h=hdx * dx,
                        h0=hdx * dx)
        compute_fluid_elevation([fluid, bed])
        dw = d - fluid.b
        fluid.m = dw * rho_w * dx ** 2
        fluid.rho = dw * rho_w
        fluid.rho0 = dw * rho_w
        fluid.dw = dw
        # drop dry cells (depth below d_min)
        d_min = 7e-5
        idx = where(np.asarray(fluid.dw) < d_min)[0]
        fluid.remove_particles(idx)

        # closed boundary: 5 staggered layers on top/bottom/right
        xcb_top = arange(self.x_min_inlet - 5 * dx,
                         l_domain + 5 * dx, dx / 2.0)
        ycb_top = zeros(0)
        for i in arange(-0.5, 2, 0.5):
            ycb_top = concatenate(
                (ycb_top, ones_like(xcb_top) * (w + i * dx)))
        xcb_top = concatenate((xcb_top, xcb_top + dx / 4.0, xcb_top,
                               xcb_top + dx / 4.0, xcb_top))
        xcb_bottom = arange(self.x_min_inlet - 5 * dx,
                            l_domain + 5 * dx, dx / 2.0)
        ycb_bottom = zeros(0)
        for i in arange(0, -2.5, -0.5):
            ycb_bottom = concatenate(
                (ycb_bottom, zeros_like(xcb_bottom) + i * dx))
        xcb_bottom = concatenate(
            (xcb_bottom, xcb_bottom + dx / 4.0, xcb_bottom,
             xcb_bottom + dx / 4.0, xcb_bottom))
        ycb_right = arange(dx / 4.0, w - dx / 4.0, dx / 2.0)
        xcb_right = zeros(0)
        for i in arange(0.5, 3.0, 0.5):
            xcb_right = concatenate(
                (xcb_right,
                 zeros_like(ycb_right) + (l_domain + i * dx)))
        ycb_right = concatenate(
            (ycb_right, ycb_right + dx / 4.0, ycb_right,
             ycb_right + dx / 4.0, ycb_right))
        xcb_all = concatenate((xcb_top, xcb_bottom, xcb_right))
        ycb_all = concatenate((ycb_top, ycb_bottom, ycb_right))
        rho_cb = ones_like(xcb_all) * rho_w * d
        dw_cb = ones_like(xcb_all) * d
        boundary = gpa_swe(
            name='boundary', x=xcb_all, y=ycb_all,
            m=(dx / 2.0) ** 2 * rho_w * d, h=hdx * dx / 2.0,
            rho=rho_cb, dw=dw_cb, cs=sqrt(9.8 * dw_cb),
            is_wall_boun_pa=ones_like(xcb_all), alpha=dim * rho_cb)
        return [inlet, fluid, bed, boundary]

    def create_inlet_outlet(self, particle_arrays):
        f_pa = particle_arrays['fluid']
        i_pa = particle_arrays['inlet']
        b_pa = particle_arrays['bed']
        cb_pa = particle_arrays['boundary']
        inlet = SWEInlet(
            i_pa, f_pa, f_pa, spacing=self.dx, n=self.num_inlet_pa,
            axis='x', xmin=self.x_min_inlet, xmax=self.x_max_inlet,
            ymin=0, ymax=self.w)
        compute_initial_props([i_pa, f_pa, b_pa, cb_pa])
        return [inlet]

    def create_solver(self):
        kernel = CubicSpline(dim=2)
        integrator = SWEIntegrator(inlet=SWEInletOutletStep(),
                                   fluid=SWEStep())
        return Solver(kernel=kernel, dim=2, integrator=integrator,
                      cfl=0.4, adaptive_timestep=True,
                      output_at_times=(10, 12, 14, 15, 16, 17, 18,
                                       20), tf=22.51)

    def pre_step(self, solver):
        # impose the measured time-varying inflow depth
        t = solver.t
        i = np.searchsorted(self.t_ob, t, side='right') - 1
        i = min(max(i, 0), len(self.t_ob) - 2)
        m1 = ((self.dw_ob[i + 1] - self.dw_ob[i]) /
              (self.t_ob[i + 1] - self.t_ob[i]))
        dw_t = self.dw_ob[i] + m1 * (t - self.t_ob[i])
        for pa in self.particles:
            if pa.name == 'inlet':
                solver._sync_to_host()
                pa.dw_at_t = ones_like(np.asarray(pa.x)) * dw_t
                solver._sync_to_device()

    def create_equations(self):
        return [
            Group(equations=[
                RemoveFluidParticlesWithNoNeighbors(
                    dest='fluid', sources=['fluid'])],
                update_nnps=True),
            Group(equations=[
                RemoveOutofDomainParticles(
                    dest='fluid', x_min=self.x_max_inlet,
                    x_max=self.le, y_min=0, y_max=self.w)],
                update_nnps=True),
            Group(equations=[
                RemoveCloseParticlesAtOpenBoundary(
                    min_dist_ob=self.min_dist_ob, dest='inlet',
                    sources=['inlet'])], update_nnps=True),
            Group(equations=[
                Group(equations=[
                    GatherDensityEvalNextIteration(
                        dest='fluid',
                        sources=['inlet', 'fluid', 'boundary'])]),
                Group(equations=[
                    NonDimensionalDensityResidual(dest='fluid')]),
                Group(equations=[
                    UpdateSmoothingLength(dim=dim, dest='fluid')],
                    update_nnps=True),
                Group(equations=[
                    CheckConvergenceDensityResidual(dest='fluid')]),
            ], iterate=True, max_iterations=10),
            Group(equations=[
                CorrectionFactorVariableSmoothingLength(
                    dest='fluid',
                    sources=['fluid', 'inlet', 'boundary'])]),
            Group(equations=[
                RemoveParticlesWithZeroAlpha(dest='fluid')],
                update_nnps=True),
            Group(equations=[SWEOS(dest='fluid')]),
            Group(equations=[
                BoundaryInnerReimannStateEval(dest='inlet',
                                              sources=['fluid'])]),
            Group(equations=[
                SubCriticalTimeVaryingOutFlow(dest='inlet')]),
            Group(equations=[
                BedFrictionSourceEval(dest='fluid',
                                      sources=['bed'])]),
            Group(equations=[
                FluidBottomElevation(dest='fluid', sources=['bed'])]),
            Group(equations=[
                FluidBottomGradient(dest='fluid', sources=['bed'])]),
            Group(equations=[
                FluidBottomCurvature(dest='fluid', sources=['bed'])]),
            Group(equations=[
                ParticleAcceleration(
                    dim=dim, dest='fluid',
                    sources=['fluid', 'inlet', 'boundary'])]),
        ]

    def post_process(self, info_fname):
        if len(self.output_files) == 0:
            return
        from pysph_tpu.solver.output import load
        from pysph_tpu.tools.interpolator import Interpolator
        # depth history at the three experimental wave sensors
        x_sens = [4.521, 4.521, 4.521]
        y_sens = [1.196, 1.696, 2.196]
        t_arr, dw_arr = [], []
        interp = None
        for fname in self.output_files:
            data = load(fname)
            fluid = data['arrays']['fluid']
            t_arr.append(data['solver_data']['t'])
            if interp is None:
                interp = Interpolator([fluid], x=np.asarray(x_sens),
                                      y=np.asarray(y_sens))
            else:
                interp.update_particle_arrays([fluid])
            dw_arr.append(interp.interpolate('dw'))
        fname_res = os.path.join(self.output_dir, 'results.npz')
        savez(fname_res, t=np.asarray(t_arr),
              dw_sensors=np.asarray(dw_arr))


def compute_fluid_elevation(particles):
    one_time_equations = [
        Group(equations=[
            FluidBottomElevation(dest='fluid', sources=['bed'])]),
        Group(equations=[
            GradientCorrectionPreStep(dest='bed', sources=['bed'])]),
        Group(equations=[
            GradientCorrection(dest='bed', sources=['bed'])]),
        Group(equations=[BedGradient(dest='bed', sources=['bed'])]),
        Group(equations=[BedCurvature(dest='bed', sources=['bed'])]),
    ]
    SPHEvaluator(particles, one_time_equations, dim=2,
                 kernel=CubicSpline(dim=2)).evaluate()


def compute_initial_props(particles):
    one_time_equations = [
        Group(equations=[SWEOS(dest='fluid')]),
        Group(equations=[
            BoundaryInnerReimannStateEval(dest='inlet',
                                          sources=['fluid'])]),
        Group(equations=[
            SubCriticalTimeVaryingOutFlow(dest='inlet')]),
    ]
    SPHEvaluator(particles, one_time_equations, dim=2,
                 kernel=CubicSpline(dim=2)).evaluate()


if __name__ == '__main__':
    app = OkushiriTsunami()
    app.run()
    app.post_process(app.info_filename)
