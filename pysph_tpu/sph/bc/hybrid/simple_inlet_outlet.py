"""Hybrid (time-averaged characteristic) inlet/outlet (parity with
/root/reference/pysph/sph/bc/hybrid/simple_inlet_outlet.py).

The 6-deep per-particle time history (``uag``/``pag`` strided rings)
shifts vectorized; the acoustic-energy gate keeps the reference's
update rule.
"""

import jax.numpy as jnp

from pysph_tpu.sph.bc.inlet_outlet_manager import InletOutletManager
from pysph_tpu.sph.equation import Equation


class SimpleInletOutlet(InletOutletManager):
    def add_io_properties(self, pa, scheme=None):
        N = 6
        default_props = [
            'disp', 'ioid', 'xn', 'yn', 'zn', 'wij', 'x0', 'y0', 'z0',
            'uhat', 'vhat', 'what', 'pacu', 'uacu', 'uta', 'pta',
            'Eacu', 'J1', 'J2u']
        stride_data = {'A': 16, 'Bp': 4, 'po': 4, 'Buh': 4, 'Bvh': 4,
                       'Bwh': 4, 'uho': 4, 'vho': 4, 'who': 4,
                       'uo': 4, 'vo': 4, 'wo': 4, 'uag': N, 'vag': N,
                       'pag': N}
        for prop in default_props:
            pa.add_property(prop)
        for prop, stride in stride_data.items():
            pa.add_property(prop, stride=stride)
        for cname in ('avgj2u', 'avgj1', 'uref'):
            if cname not in pa.constants:
                pa.add_constant(cname, 0.0)

    def get_stepper(self, scheme, cls, edactvf=True):
        from pysph_tpu.sph.bc.inlet_outlet_manager import (InletStep,
                                                           OutletStep)
        from pysph_tpu.sph.integrator import PECIntegrator
        steppers = {}
        if cls == PECIntegrator:
            for inlet in self.inlets:
                steppers[inlet] = InletStep()
            for outlet in self.outlets:
                steppers[outlet] = OutletStep()
            self.active_stages = [2]
        return steppers

    def get_equations(self, scheme=None, summation_density=False,
                      edactvf=True):
        from pysph_tpu.sph.bc.inlet_outlet_manager import (
            CopyNormalsandDistances, UpdateNormalsAndDisplacements)
        from pysph_tpu.sph.bc.interpolate import (
            CopyPFromGhost, CopyUhatFromGhost, EvaluateP, EvaluateUhat,
            ExtrapolateP, ExtrapolateUhat, UpdateMomentMatrix)
        from pysph_tpu.sph.equation import Group

        all_pairs = {}
        all_pairs.update(self.inlet_pairs)
        all_pairs.update(self.outlet_pairs)
        umax = [info.umax for info in self.inletinfo] or [1.0]

        equations = []
        g00 = []
        for info in self.inletinfo:
            g00.append(UpdateNormalsAndDisplacements(
                dest=info.pa_name, sources=None, xn=info.normal[0],
                yn=info.normal[1], zn=info.normal[2],
                xo=info.refpoint[0], yo=info.refpoint[1],
                zo=info.refpoint[2]))
            g00.append(CopyNormalsandDistances(
                dest=all_pairs[info.pa_name], sources=[info.pa_name]))
        equations.append(Group(equations=g00, real=False))

        g02 = []
        for name in self.fluids:
            g02.append(CopyTimeValues(dest=name, sources=None,
                                      rho=scheme.rho0, c0=scheme.c0,
                                      u0=min(umax)))
            g02.append(EvalauteCharacterisctics(
                dest=name, sources=None, c0=scheme.c0,
                rho0=scheme.rho0))
        for name in self.ghost_inlets:
            g02.append(UpdateMomentMatrix(
                dest=name, sources=self.fluids, dim=self.dim))
        equations.append(Group(equations=g02, real=False))

        g02a = []
        for name in self.fluids:
            g02a.append(ComputeTimeAverage(dest=name, sources=None))
        for name in self.outlets:
            g02a.append(EvalauteNumberdensity(dest=name,
                                              sources=self.fluids))
            g02a.append(ShepardInterpolateCharacteristics(
                dest=name, sources=self.fluids))
        equations.append(Group(equations=g02a, real=False))

        g03 = []
        for name in self.ghost_inlets:
            g03.append(EvaluateUhat(dest=name, sources=self.fluids,
                                    dim=self.dim))
            g03.append(EvaluateP(dest=name, sources=self.fluids,
                                 dim=self.dim))
        equations.append(Group(equations=g03, real=False))

        g04 = []
        for name in self.ghost_inlets:
            g04.append(ExtrapolateUhat(dest=name, sources=None))
            g04.append(ExtrapolateP(dest=name, sources=None))
        for name in self.outlets:
            g04.append(EvaluatePropertyfromCharacteristics(
                dest=name, sources=None, c0=scheme.c0,
                rho0=scheme.rho0))
        equations.append(Group(equations=g04, real=False))

        g05 = []
        for io in self.inlet_pairs:
            g05.append(CopyUhatFromGhost(
                dest=io, sources=[all_pairs[io]]))
            g05.append(CopyPFromGhost(
                dest=io, sources=[all_pairs[io]]))
        equations.append(Group(equations=g05, real=False))

        g07 = []
        for info in self.inletinfo + self.outletinfo:
            g07.extend(info.equations)
        equations.append(Group(equations=g07, real=False))

        equations.append(Group(equations=[
            MoveGhostInlet(dest=name, sources=None)
            for name in self.ghost_inlets], real=False))
        return equations


class MoveGhostInlet(Equation):
    """(reference hybrid/simple_inlet_outlet.py:156)"""

    def loop(self, d_idx, d_u, d_x, dt):
        d_x[d_idx] += d_u[d_idx] * dt


class CopyTimeValues(Equation):
    """Shift the 6-deep time ring and record u/p when the acoustic
    energy is below the threshold
    (reference hybrid/simple_inlet_outlet.py:161)."""

    def __init__(self, dest, sources, rho, c0, u0):
        self.rho = rho
        self.c0 = c0
        self.u0 = u0
        self.Imin = 0.5 * rho * u0 ** 2
        super(CopyTimeValues, self).__init__(dest, sources)

    def initialize(self, d_idx, d_u, d_v, d_p, d_uag, d_pag, d_uta,
                   d_pta, d_Eacu, t, d_uref):
        N = 6
        for i in range(N - 1):
            d_uag[N * d_idx + (N - 1 - i)] = \
                d_uag[N * d_idx + (N - 2 - i)]
            d_pag[N * d_idx + (N - 1 - i)] = \
                d_pag[N * d_idx + (N - 2 - i)]
        u0 = d_uref[0]
        fac = 1.0 / (2.0 * self.rho * self.c0)
        Imin = (0.5 * self.rho * u0 ** 2) ** 2 * fac
        eacu = d_p[d_idx] * d_p[d_idx] * fac
        d_Eacu[d_idx] = eacu
        quiet = eacu < Imin
        d_uag[N * d_idx + 0] = jnp.where(quiet, d_u[d_idx],
                                         d_uag[N * d_idx + 0])
        d_pag[N * d_idx + 0] = jnp.where(quiet, d_p[d_idx],
                                         d_pag[N * d_idx + 0])


class ComputeTimeAverage(Equation):
    """(reference hybrid/simple_inlet_outlet.py:191)"""

    def initialize(self, d_idx, d_uag, d_pag, d_uta, d_pta):
        N = 6
        uta = 0.0
        pta = 0.0
        for i in range(N):
            uta = uta + d_uag[N * d_idx + i]
            pta = pta + d_pag[N * d_idx + i]
        d_uta[d_idx] = uta / N
        d_pta[d_idx] = pta / N


class EvalauteCharacterisctics(Equation):
    """(reference hybrid/simple_inlet_outlet.py:208)"""

    def __init__(self, dest, sources, c0, rho0):
        self.c0 = c0
        self.rho0 = rho0
        super(EvalauteCharacterisctics, self).__init__(dest, sources)

    def initialize(self, d_idx, d_u, d_p, d_J1, d_J2u, d_uta, d_pta):
        a = self.c0
        uref = d_uta[d_idx]
        pref = d_pta[d_idx]
        d_J1[d_idx] = d_p[d_idx] - pref
        d_J2u[d_idx] = (self.rho0 * a * (d_u[d_idx] - uref) +
                        (d_p[d_idx] - pref))


class EvalauteNumberdensity(Equation):
    """(reference hybrid/simple_inlet_outlet.py:225)"""

    def initialize(self, d_idx, d_wij):
        d_wij[d_idx] = 0.0

    def loop(self, d_idx, d_wij, WIJ):
        d_wij[d_idx] += WIJ


class ShepardInterpolateCharacteristics(Equation):
    """(reference hybrid/simple_inlet_outlet.py:233)"""

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
    """(reference hybrid/simple_inlet_outlet.py:255)"""

    def __init__(self, dest, sources, c0, rho0):
        self.c0 = c0
        self.rho0 = rho0
        super(EvaluatePropertyfromCharacteristics,
              self).__init__(dest, sources)

    def initialize(self, d_idx, d_rho, d_J2u, d_uta, d_pta, d_u, d_p,
                   dt, t):
        started = t > 20 * dt
        j2u = d_J2u[d_idx]
        u_new = d_uta[d_idx] + j2u / (2 * self.rho0 * self.c0)
        p_new = d_pta[d_idx] + 0.5 * j2u
        d_u[d_idx] = jnp.where(started, u_new, d_u[d_idx])
        d_p[d_idx] = jnp.where(started, p_new, d_p[d_idx])
