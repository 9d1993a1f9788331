"""1D wall-shock: two cold streams colliding head-on at Mach ~1000
(parity case for
/root/reference/pysph/examples/gas_dynamics/wallshock.py)."""

from pysph_tpu.examples.gas_dynamics.shocktube_setup import ShockTubeSetup
from pysph_tpu.sph.gas_dynamics.magma2 import MAGMA2Scheme
from pysph_tpu.sph.gas_dynamics.psph import PSPHScheme
from pysph_tpu.sph.gas_dynamics.tsph import TSPHScheme
from pysph_tpu.sph.scheme import (ADKEScheme, GasDScheme, GSPHScheme,
                                  SchemeChooser)

dim = 1
gamma = 1.4
gamma1 = gamma - 1.0
dt = 1e-6
tf = 0.4


class WallShock(ShockTubeSetup):
    def initialize(self):
        self.xmin = -0.5
        self.xmax = 0.5
        self.x0 = 0.0
        self.rhol, self.rhor = 1.0, 1.0
        self.pl, self.pr = 4e-7, 4e-7
        self.ul, self.ur = 1.0, -1.0

    def add_user_options(self, group):
        group.add_argument('--hdx', action='store', type=float,
                           dest='hdx', default=1.5)
        group.add_argument('--nl', action='store', type=float,
                           dest='nl', default=500)

    def consume_user_options(self):
        self.nl = self.options.nl
        self.hdx = self.options.hdx
        self.dxl = (self.x0 - self.xmin) / self.nl
        self.dxr = self.dxl / (self.rhor / self.rhol)
        self.h0 = self.hdx * self.dxr

    def create_particles(self):
        return self.generate_particles(
            xmin=self.xmin, xmax=self.xmax, x0=self.x0,
            rhol=self.rhol, rhor=self.rhor, pl=self.pl, pr=self.pr,
            bx=0.02, gamma1=gamma1, ul=self.ul, ur=self.ur,
            dxl=self.dxl, dxr=self.dxr, h0=self.h0)

    def create_scheme(self):
        self.dt = dt
        self.tf = tf
        adke = ADKEScheme(
            fluids=['fluid'], solids=['boundary'], dim=dim,
            gamma=gamma, alpha=1, beta=1, k=0.7, eps=0.5, g1=0.5,
            g2=1.0)
        mpm = GasDScheme(
            fluids=['fluid'], solids=['boundary'], dim=dim,
            gamma=gamma, kernel_factor=1.2, alpha1=1.0, alpha2=0.1,
            beta=2.0, update_alpha1=True, update_alpha2=True)
        gsph = GSPHScheme(
            fluids=['fluid'], solids=['boundary'], dim=dim,
            gamma=gamma, kernel_factor=1.0, g1=0.2, g2=0.4,
            rsolver=2, interpolation=1, monotonicity=1,
            interface_zero=True, hybrid=False, blend_alpha=2.0,
            niter=20, tol=1e-6)
        psph = PSPHScheme(fluids=['fluid'], solids=['boundary'],
                          dim=dim, gamma=gamma, hfact=1.2)
        tsph = TSPHScheme(fluids=['fluid'], solids=['boundary'],
                          dim=dim, gamma=gamma, hfact=1.2)
        magma2 = MAGMA2Scheme(fluids=['fluid'], solids=['boundary'],
                              dim=dim, gamma=gamma, ndes=7,
                              recycle_accelerations=False)
        return SchemeChooser(default='adke', adke=adke, mpm=mpm,
                             gsph=gsph, psph=psph, tsph=tsph,
                             magma2=magma2)

    def configure_scheme(self):
        self.scheme.configure_solver(dt=dt, tf=tf,
                                     adaptive_timestep=False,
                                     pfreq=50)


if __name__ == '__main__':
    app = WallShock()
    app.run()
    app.post_process(app.info_filename)
