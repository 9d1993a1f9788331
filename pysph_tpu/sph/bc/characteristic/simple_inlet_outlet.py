"""Characteristic-based outlet (parity with
/root/reference/pysph/sph/bc/characteristic/simple_inlet_outlet.py)."""

import jax.numpy as jnp

from pysph_tpu.sph.bc.inlet_outlet_manager import InletOutletManager
from pysph_tpu.sph.equation import Equation


class SimpleInletOutlet(InletOutletManager):
    def add_io_properties(self, pa, scheme=None):
        default_props = [
            'disp', 'ioid', 'wij', 'x0', 'y0', 'z0', 'uhat', 'vhat',
            'what', 'xn', 'yn', 'zn', 'J1', 'J2u']
        stride_data = {'A': 16, 'Bp': 4, 'po': 4, 'Buh': 4, 'Bvh': 4,
                       'Bwh': 4, 'uho': 4, 'vho': 4, 'who': 4}
        for prop in default_props:
            pa.add_property(prop)
        for prop, stride in stride_data.items():
            pa.add_property(prop, stride=stride)
        for cname in ('uref', 'avgj2u', 'avgj1'):
            if cname not in pa.constants:
                pa.add_constant(cname, 0.0)

    def get_stepper(self, scheme, cls, edactvf=False):
        from pysph_tpu.sph.bc.inlet_outlet_manager import (InletStep,
                                                           OutletStep)
        from pysph_tpu.sph.integrator import PECIntegrator
        steppers = {}
        if cls == PECIntegrator:
            for inlet in self.inlets:
                steppers[inlet] = InletStep()
            for outlet in self.outlets:
                steppers[outlet] = OutletStep()
            for g_inlet in self.ghost_inlets:
                steppers[g_inlet] = InletStep()
            self.active_stages = [2]
        return steppers

    def get_equations(self, scheme=None, summation_density=False,
                      edactvf=False):
        from pysph_tpu.sph.bc.inlet_outlet_manager import (
            CopyNormalsandDistances, UpdateNormalsAndDisplacements)
        from pysph_tpu.sph.bc.interpolate import (
            CopyPFromGhost, CopyUhatFromGhost, EvaluateP, EvaluateUhat,
            ExtrapolateP, ExtrapolateUhat, UpdateMomentMatrix)
        from pysph_tpu.sph.equation import Group

        equations = []
        g00 = []
        for info in self.inletinfo:
            g00.append(UpdateNormalsAndDisplacements(
                dest=info.pa_name, sources=None, xn=info.normal[0],
                yn=info.normal[1], zn=info.normal[2],
                xo=info.refpoint[0], yo=info.refpoint[1],
                zo=info.refpoint[2]))
            g00.append(CopyNormalsandDistances(
                dest=self.inlet_pairs[info.pa_name],
                sources=[info.pa_name]))
        for fluid in self.fluids:
            g00.append(EvalauteCharacterisctics(
                dest=fluid, sources=None, c0=10.0, u0=1.0, v0=0.0,
                p0=1.0, rho0=1000.0))
        equations.append(Group(equations=g00, real=False))

        equations.append(Group(equations=[
            UpdateMomentMatrix(dest=name, sources=self.fluids,
                               dim=self.dim)
            for name in self.ghost_inlets], real=False))

        g03 = []
        for name in self.ghost_inlets:
            g03.append(EvaluateUhat(dest=name, sources=self.fluids,
                                    dim=self.dim))
            g03.append(EvaluateP(dest=name, sources=self.fluids,
                                 dim=self.dim))
        for name in self.outlets:
            g03.append(EvalauteNumberdensity(dest=name,
                                             sources=self.fluids))
            g03.append(ShepardInterpolateCharacteristics(
                dest=name, sources=self.fluids))
        equations.append(Group(equations=g03, real=False))

        g04 = []
        for name in self.ghost_inlets:
            g04.append(ExtrapolateUhat(dest=name, sources=None))
            g04.append(ExtrapolateP(dest=name, sources=None))
        for name in self.outlets:
            g04.append(EvaluatePropertyfromCharacteristics(
                dest=name, sources=None, c0=10.0, u0=1.0, v0=0.0,
                p0=1.0, rho0=1000.0))
        equations.append(Group(equations=g04, real=False))

        g05 = []
        for io in self.inlet_pairs:
            g05.append(CopyUhatFromGhost(
                dest=io, sources=[self.inlet_pairs[io]]))
            g05.append(CopyPFromGhost(
                dest=io, sources=[self.inlet_pairs[io]]))
        equations.append(Group(equations=g05, real=False))

        g06 = []
        for info in self.inletinfo + self.outletinfo:
            g06.extend(info.equations)
        equations.append(Group(equations=g06, real=False))
        return equations


class EvalauteCharacterisctics(Equation):
    """(reference characteristic/simple_inlet_outlet.py:135)"""

    def __init__(self, dest, sources, c0, rho0, u0, p0, v0):
        self.c0 = c0
        self.rho0 = rho0
        self.p0 = p0
        self.u0 = u0
        self.v0 = v0
        super(EvalauteCharacterisctics, self).__init__(dest, sources)

    def initialize(self, d_idx, d_u, d_v, d_p, d_rho, d_J1, d_J2u):
        a = self.c0
        d_J1[d_idx] = (-a ** 2 * (d_rho[d_idx] - self.rho0) +
                       (d_p[d_idx] - self.p0))
        d_J2u[d_idx] = (d_rho[d_idx] * a * (d_u[d_idx] - self.u0) +
                        (d_p[d_idx] - self.p0))


class EvalauteNumberdensity(Equation):
    """(reference characteristic/simple_inlet_outlet.py:155)"""

    def initialize(self, d_idx, d_wij):
        d_wij[d_idx] = 0.0

    def loop(self, d_idx, d_wij, WIJ):
        d_wij[d_idx] += WIJ


class ShepardInterpolateCharacteristics(Equation):
    """(reference characteristic/simple_inlet_outlet.py:163)"""

    def initialize(self, d_idx, d_J1, d_J2u):
        d_J1[d_idx] = 0.0
        d_J2u[d_idx] = 0.0

    def loop(self, d_idx, d_J1, d_J2u, s_J1, s_J2u, WIJ, s_idx):
        d_J1[d_idx] += s_J1[s_idx] * WIJ
        d_J2u[d_idx] += s_J2u[s_idx] * WIJ

    def post_loop(self, d_idx, d_J1, d_J2u, d_wij, d_avgj2u, d_avgj1):
        ok = d_wij[d_idx] > 1e-14
        denom = jnp.where(ok, d_wij[d_idx], 1.0)
        d_J1[d_idx] = jnp.where(ok, d_J1[d_idx] / denom, d_avgj1[0])
        d_J2u[d_idx] = jnp.where(ok, d_J2u[d_idx] / denom,
                                 d_avgj2u[0])

    def reduce(self, dst, t, dt):
        mask = dst.active & (dst.wij[:] > 1e-4)
        n = jnp.maximum(jnp.sum(jnp.where(mask, 1.0, 0.0)), 1.0)
        dst.avgj2u[0] = jnp.sum(jnp.where(mask, dst.J2u[:], 0.0)) / n
        dst.avgj1[0] = jnp.sum(jnp.where(mask, dst.J1[:], 0.0)) / n


class EvaluatePropertyfromCharacteristics(Equation):
    """(reference characteristic/simple_inlet_outlet.py:185)"""

    def __init__(self, dest, sources, c0, rho0, u0, p0, v0):
        self.c0 = c0
        self.rho0 = rho0
        self.p0 = p0
        self.u0 = u0
        self.v0 = v0
        super(EvaluatePropertyfromCharacteristics,
              self).__init__(dest, sources)

    def initialize(self, d_idx, d_u, d_v, d_p, d_rho, d_J1, d_J2u):
        j1 = d_J1[d_idx]
        j2u = d_J2u[d_idx]
        d_rho[d_idx] = self.rho0 + (-j1 + 0.5 * j2u) / self.c0 ** 2
        d_u[d_idx] = self.u0 + j2u / (2 * d_rho[d_idx] * self.c0)
        d_p[d_idx] = self.p0 + 0.5 * j2u
