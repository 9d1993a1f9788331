"""Mirror-ghost inlet/outlet method (parity with
/root/reference/pysph/sph/bc/mirror/simple_inlet_outlet.py)."""

from pysph_tpu.sph.bc.inlet_outlet_manager import InletOutletManager


class SimpleInletOutlet(InletOutletManager):
    def add_io_properties(self, pa, scheme=None):
        default_props = [
            'disp', 'ioid', 'xn', 'yn', 'zn', 'wij', 'x0', 'y0', 'z0',
            'uhat', 'vhat', 'what']
        stride_data = {
            'A': 16, 'Bu': 4, 'Bv': 4, 'Bw': 4, 'Bp': 4, 'uo': 4,
            'vo': 4, 'wo': 4, 'po': 4, 'Buh': 4, 'Bvh': 4, 'Bwh': 4,
            'uho': 4, 'vho': 4, 'who': 4}
        for prop in default_props:
            pa.add_property(prop)
        for prop, stride in stride_data.items():
            pa.add_property(prop, stride=stride)
        if 'uref' not in pa.constants:
            pa.add_constant('uref', 0.0)

    def get_stepper(self, scheme, cls, edactvf=True):
        from pysph_tpu.sph.bc.inlet_outlet_manager import (
            InletStep, OutletStepWithUhat)
        from pysph_tpu.sph.integrator import PECIntegrator
        steppers = {}
        if cls == PECIntegrator:
            for inlet in self.inlets:
                steppers[inlet] = InletStep()
            for outlet in self.outlets:
                steppers[outlet] = OutletStepWithUhat()
            for g_inlet in self.ghost_inlets:
                steppers[g_inlet] = InletStep()
            for g_outlet in self.ghost_outlets:
                steppers[g_outlet] = OutletStepWithUhat()
            self.active_stages = [2]
        return steppers

    def get_equations(self, scheme=None, summation_density=False,
                      edactvf=True):
        from pysph_tpu.sph.bc.inlet_outlet_manager import (
            CopyNormalsandDistances, UpdateNormalsAndDisplacements)
        from pysph_tpu.sph.bc.interpolate import (
            CopyPFromGhost, CopyUFromGhost, CopyUhatFromGhost,
            EvaluateP, EvaluateU, EvaluateUhat, ExtrapolateP,
            ExtrapolateU, ExtrapolateUhat, UpdateMomentMatrix)
        from pysph_tpu.sph.equation import Group

        all_ghosts = self.ghost_inlets + self.ghost_outlets
        all_info = self.inletinfo + self.outletinfo
        all_pairs = {}
        all_pairs.update(self.inlet_pairs)
        all_pairs.update(self.outlet_pairs)

        equations = []
        g00 = []
        for info in all_info:
            g00.append(UpdateNormalsAndDisplacements(
                dest=info.pa_name, sources=None, xn=info.normal[0],
                yn=info.normal[1], zn=info.normal[2],
                xo=info.refpoint[0], yo=info.refpoint[1],
                zo=info.refpoint[2]))
            g00.append(CopyNormalsandDistances(
                dest=all_pairs[info.pa_name], sources=[info.pa_name]))
        equations.append(Group(equations=g00, real=False))

        equations.append(Group(equations=[
            UpdateMomentMatrix(dest=name, sources=self.fluids,
                               dim=self.dim)
            for name in all_ghosts], real=False))

        g03 = []
        for name in all_ghosts:
            g03.append(EvaluateUhat(dest=name, sources=self.fluids,
                                    dim=self.dim))
            g03.append(EvaluateP(dest=name, sources=self.fluids,
                                 dim=self.dim))
        for name in self.ghost_outlets:
            g03.append(EvaluateU(dest=name, sources=self.fluids,
                                 dim=self.dim))
        equations.append(Group(equations=g03, real=False))

        g04 = []
        for name in all_ghosts:
            g04.append(ExtrapolateUhat(dest=name, sources=None))
            g04.append(ExtrapolateP(dest=name, sources=None))
        for name in self.ghost_outlets:
            g04.append(ExtrapolateU(dest=name, sources=None))
        equations.append(Group(equations=g04, real=False))

        g05 = []
        for io in all_pairs:
            g05.append(CopyUhatFromGhost(dest=io,
                                         sources=[all_pairs[io]]))
            g05.append(CopyPFromGhost(dest=io,
                                      sources=[all_pairs[io]]))
        for io in self.outlet_pairs:
            g05.append(CopyUFromGhost(dest=io,
                                      sources=[all_pairs[io]]))
        equations.append(Group(equations=g05, real=False))

        g06 = []
        for info in all_info:
            g06.extend(info.equations)
        equations.append(Group(equations=g06, real=False))
        return equations
