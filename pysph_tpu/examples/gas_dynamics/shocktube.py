"""Sod shock tube (1D compressible gas dynamics).

Exercises the GasDScheme (grad-h MPM with density iterations) and the
ADKE scheme; parity with the reference shocktube setups in
/root/reference/pysph/examples/gas_dynamics/."""

import numpy as np

from pysph_tpu.base.utils import get_particle_array_gasd
from pysph_tpu.solver.application import Application
from pysph_tpu.sph.scheme import (ADKEScheme, GasDScheme, GSPHScheme,
                                  SchemeChooser)


class ShockTube(Application):
    def initialize(self):
        self.xmin = -0.5
        self.xmax = 0.5
        self.gamma = 1.4
        self.rhol, self.rhor = 1.0, 0.125
        self.pl, self.pr = 1.0, 0.1
        self.nl = 320

    def add_user_options(self, group):
        group.add_argument('--nl', action='store', type=int, dest='nl',
                           default=320,
                           help='Particles left of the diaphragm.')

    def consume_user_options(self):
        self.nl = self.options.nl

    def create_scheme(self):
        mpm = GasDScheme(
            fluids=['fluid'], solids=[], dim=1, gamma=self.gamma,
            kernel_factor=1.2, alpha1=1.0, alpha2=0.1, beta=2.0)
        adke = ADKEScheme(
            fluids=['fluid'], solids=[], dim=1, gamma=self.gamma,
            alpha=1.0, beta=1.0, k=0.3, eps=0.5, g1=0.2, g2=0.4)
        gsph = GSPHScheme(
            fluids=['fluid'], solids=[], dim=1, gamma=self.gamma,
            kernel_factor=1.0, g1=0.25, g2=0.5, rsolver=2,
            interpolation=1, monotonicity=1, interface_zero=True,
            hybrid=False, blend_alpha=2.0, niter=20, tol=1e-6)
        return SchemeChooser(default='mpm', mpm=mpm, adke=adke,
                             gsph=gsph)

    def configure_scheme(self):
        dt = 1e-4
        tf = 0.15
        self.scheme.configure_solver(dt=dt, tf=tf, pfreq=200)

    def create_particles(self):
        gamma1 = self.gamma - 1.0
        dxl = 0.5 / self.nl
        ratio = self.rhor / self.rhol
        nr = int(self.nl * ratio)
        dxr = 0.5 / nr
        xl = np.arange(self.xmin + 0.5 * dxl, 0.0, dxl)
        xr = np.arange(0.0 + 0.5 * dxr, self.xmax, dxr)
        x = np.concatenate([xl, xr])
        rho = np.where(x < 0, self.rhol, self.rhor)
        p = np.where(x < 0, self.pl, self.pr)
        m = np.where(x < 0, dxl * self.rhol, dxr * self.rhor)
        h = 1.2 * 2.0 * np.where(x < 0, dxl, dxr)
        e = p / (gamma1 * rho)
        cs = np.sqrt(self.gamma * p / rho)
        pa = get_particle_array_gasd(
            name='fluid', x=x, rho=rho, p=p, m=m, h=h, e=e, cs=cs,
            h0=h.copy())
        pa.add_property('htmp')
        pa.add_property('logrho')
        pa.add_property('wij')
        self.scheme.setup_properties([pa])
        print('Shock tube: %d particles' % pa.get_number_of_particles())
        return [pa]

    def post_process(self, info_fname_or_dir='.'):
        from pysph_tpu.solver.output import load
        files = self.output_files
        if not files:
            return
        data = load(files[-1])
        fluid = data['arrays']['fluid']
        return dict(x=np.asarray(fluid.x), rho=np.asarray(fluid.rho),
                    p=np.asarray(fluid.p), u=np.asarray(fluid.u))


if __name__ == '__main__':
    app = ShockTube()
    app.run()
    app.post_process(app.info_filename)
