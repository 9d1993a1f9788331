"""Shared setup for the 1D shock-tube family (parity with
/root/reference/pysph/examples/gas_dynamics/shocktube_setup.py):
piecewise-constant (optionally smoothed) left/right states with
frozen boundary bands outside [xmin, xmax]."""

import numpy as np

from pysph_tpu.base.utils import get_particle_array as gpa
from pysph_tpu.solver.application import Application


class ShockTubeSetup(Application):
    def generate_particles(self, xmin, xmax, dxl, dxr, rhol, rhor,
                           pl, pr, bx, gamma1, h0=None, x0=0.0,
                           ul=0.0, ur=0.0, constants=None):
        constants = constants or {}
        xt1 = np.arange(xmin - bx + 0.5 * dxl, x0, dxl)
        xt2 = np.arange(x0 + 0.5 * dxr, xmax + bx, dxr)
        xt = np.concatenate([xt1, xt2])
        b = xt[(xt <= xmin) | (xt >= xmax)]
        x = xt[(xt > xmin) & (xt < xmax)]
        right = x > x0

        smooth = getattr(self, 'smooth_ic', False)
        if smooth:
            deltax = 1.5 * np.mean(x[1:] - x[:-1])
            s = 1.0 / (1 + np.exp((x - x0) / deltax))
            p = (pl - pr) * s + pr
            u = (ul - ur) * s + ur
            rho = (rhol - rhor) * s + rhor
        else:
            rho = np.where(right, rhor, rhol)
            p = np.where(right, pr, pl)
            u = np.where(right, ur, ul)
        dx = np.where(right, dxr, dxl)
        m = rho * dx
        h = dx * self.hdx if h0 is None else np.full_like(x, h0)
        e = p / (gamma1 * rho)

        brho = np.ones_like(b)
        bp = np.ones_like(b)
        bh0 = dxl * self.hdx if h0 is None else h0
        fluid = gpa(constants=constants, name='fluid', x=x, rho=rho,
                    p=p, e=e, h=h, m=m, u=u, wij=np.ones_like(x),
                    h0=h.copy())
        boundary = gpa(constants=constants, name='boundary', x=b,
                       rho=brho, p=bp, e=bp / (gamma1 * brho),
                       h=np.full_like(b, 4 * bh0),
                       m=np.full_like(b, dxl),
                       wij=np.ones_like(b),
                       h0=np.full_like(b, 4 * bh0),
                       htmp=np.ones_like(b))
        self.scheme.setup_properties([fluid, boundary])
        print('1D shock tube with %d particles'
              % fluid.get_number_of_particles())
        return [fluid, boundary]

    def post_process(self, info_fname_or_dir='.'):
        """Save the final profiles (density, velocity, pressure,
        energy) for comparison against the exact Riemann solution."""
        from pysph_tpu.solver.output import load
        files = self.output_files
        if not files:
            return
        data = load(files[-1])
        pa = data['arrays']['fluid']
        out = {k: np.asarray(getattr(pa, k))
               for k in ('x', 'rho', 'u', 'p', 'e')}
        np.savez(self.output_dir + '/results.npz', **out)
        return out
