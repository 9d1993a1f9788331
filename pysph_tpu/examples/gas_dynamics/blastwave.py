"""1D blast wave: a 10^5 pressure ratio across the diaphragm (parity
case for /root/reference/pysph/examples/gas_dynamics/blastwave.py,
~30 s serial CPU there)."""

from pysph_tpu.sph.scheme import add_bool_argument
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
tf = 0.0075


class Blastwave(ShockTubeSetup):
    def initialize(self):
        self.xmin = -0.5
        self.xmax = 0.5
        self.x0 = 0.0
        self.rhol, self.rhor = 1.0, 1.0
        self.pl, self.pr = 1000.0, 0.01
        self.ul, self.ur = 0.0, 0.0

    def add_user_options(self, group):
        group.add_argument('--hdx', action='store', type=float,
                           dest='hdx', default=1.5)
        group.add_argument('--nl', action='store', type=float,
                           dest='nl', default=200)
        add_bool_argument(group, 'smooth-ic', dest='smooth_ic',
                          default=False,
                          help='Smooth the initial condition.')

    def consume_user_options(self):
        self.nl = self.options.nl
        self.hdx = self.options.hdx
        self.smooth_ic = self.options.smooth_ic
        self.dxl = (self.x0 - self.xmin) / self.nl
        self.dxr = self.dxl / (self.rhor / self.rhol)
        self.h0 = self.hdx * self.dxr

    def create_particles(self):
        return self.generate_particles(
            xmin=self.xmin, xmax=self.xmax, x0=self.x0,
            rhol=self.rhol, rhor=self.rhor, pl=self.pl, pr=self.pr,
            bx=0.03, gamma1=gamma1, ul=self.ul, ur=self.ur,
            dxl=self.dxl, dxr=self.dxr, h0=self.h0)

    def create_scheme(self):
        self.dt = dt
        self.tf = tf
        adke = ADKEScheme(
            fluids=['fluid'], solids=['boundary'], dim=dim,
            gamma=gamma, alpha=1, beta=1, k=1.0, eps=0.5, g1=0.2,
            g2=0.4)
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
        return SchemeChooser(default='adke', adke=adke, gsph=gsph,
                             psph=psph, tsph=tsph, magma2=magma2)

    def configure_scheme(self):
        self.scheme.configure_solver(dt=dt, tf=tf,
                                     adaptive_timestep=False,
                                     pfreq=50)


if __name__ == '__main__':
    app = Blastwave()
    app.run()
    app.post_process(app.info_filename)
