"""Oscillating elastic plate clamped at one end (parity case for
/root/reference/pysph/examples/solid_mech/oscillating_plate.py).

Gray, Monaghan & Swift, "SPH elastic dynamics", CMAME 190 (2001)
6641-6662: a cantilever plate given the first-mode transverse
velocity profile of an Euler-Bernoulli beam."""

import numpy as np
from numpy import cos, cosh, sin, sinh

from pysph_tpu.base.kernels import CubicSpline
from pysph_tpu.solver.application import Application
from pysph_tpu.sph.solid_mech.basic import (
    ElasticSolidsScheme, get_particle_array_elastic_dynamics)


class OscillatingPlate(Application):
    def initialize(self):
        self.L = 0.2
        self.H = 0.02
        self.KL = 1.875
        self.K = 1.875 / self.L
        self.Vf = 0.05            # edge velocity scale (m/s)
        self.dx_plate = 0.002
        self.h = 1.3 * self.dx_plate
        self.plate_rho0 = 1000.0
        self.plate_E = 2.0e6
        self.plate_nu = 0.3975
        self.plate_inside_wall_length = self.L / 4.0
        self.wall_layers = 3
        self.tf = 1.0
        self.dt = 1e-5

    def _plate_points(self):
        dx = self.dx_plate
        xp, yp = np.mgrid[
            -self.plate_inside_wall_length:self.L + dx / 2:dx,
            -self.H / 2:self.H / 2 + dx / 2:dx]
        return xp.ravel(), yp.ravel()

    def _wall_points(self):
        dx = self.dx_plate
        xp, yp = self._plate_points()
        nl = self.wall_layers
        xlo = -self.plate_inside_wall_length
        # wall wraps the clamped part of the plate (above, below, left)
        xs, ys = [], []
        for layer in range(1, nl + 1):
            xr = np.arange(xlo, dx / 2, dx)
            xs.append(xr)
            ys.append(np.full_like(xr, yp.max() + layer * dx))
            xs.append(xr)
            ys.append(np.full_like(xr, yp.min() - layer * dx))
        yl = np.arange(yp.min() - nl * dx, yp.max() + (nl + 0.5) * dx,
                       dx)
        for layer in range(1, nl + 1):
            xs.append(np.full_like(yl, xp.min() - layer * dx))
            ys.append(yl)
        return np.concatenate(xs), np.concatenate(ys)

    def create_particles(self):
        xp, yp = self._plate_points()
        m = self.plate_rho0 * self.dx_plate ** 2
        kernel = CubicSpline(dim=2)
        wdeltap = kernel.kernel(
            xij=[self.dx_plate, 0.0, 0.0], rij=self.dx_plate,
            h=self.h)
        # the free-end particle whose deflection is tracked
        fltr = np.argwhere(xp == xp.max())
        amplitude_idx = int(fltr[len(fltr) // 2][0])
        plate = get_particle_array_elastic_dynamics(
            x=xp, y=yp, m=m, h=self.h, rho=self.plate_rho0,
            name='plate',
            constants=dict(wdeltap=wdeltap, n=4,
                           rho_ref=self.plate_rho0, E=self.plate_E,
                           nu=self.plate_nu,
                           amplitude_idx=amplitude_idx))

        # first-mode Euler-Bernoulli transverse velocity on the free
        # part
        K, KL = self.K, self.KL
        M = sin(KL) + sinh(KL)
        N = cos(KL) + cosh(KL)
        Q = 2 * (cos(KL) * sinh(KL) - sin(KL) * cosh(KL))
        v = np.zeros_like(xp)
        free = xp > 0
        t1 = cos(K * xp[free]) - cosh(K * xp[free])
        t2 = sin(K * xp[free]) - sinh(K * xp[free])
        v[free] = self.Vf * float(np.asarray(plate.cs)[0]) * \
            (M * t1 - N * t2) / Q
        plate.v[:] = v

        xw, yw = self._wall_points()
        wall = get_particle_array_elastic_dynamics(
            x=xw, y=yw, m=m, h=self.h, rho=self.plate_rho0,
            name='wall',
            constants=dict(E=self.plate_E, nu=self.plate_nu))
        print('Oscillating plate: %d plate, %d wall' % (
            plate.get_number_of_particles(),
            wall.get_number_of_particles()))
        return [plate, wall]

    def create_scheme(self):
        s = ElasticSolidsScheme(elastic_solids=['plate'],
                                solids=['wall'], dim=2)
        s.configure_solver(dt=self.dt, tf=self.tf, pfreq=500)
        return s

    def post_process(self, info_fname_or_dir='.'):
        """Free-end deflection history."""
        from pysph_tpu.solver.output import load
        files = self.output_files
        if not files:
            return
        t, amp = [], []
        for f in files:
            data = load(f)
            plate = data['arrays']['plate']
            idx = int(np.asarray(plate.amplitude_idx)[0])
            t.append(data['solver_data']['t'])
            amp.append(float(np.asarray(plate.y)[idx]))
        np.savez(self.output_dir + '/results.npz', t=np.asarray(t),
                 amplitude=np.asarray(amp))
        return t, amp


if __name__ == '__main__':
    app = OscillatingPlate()
    app.run()
    app.post_process(app.info_filename)
