"""Rigid body motion, fluid coupling and DEM-style collisions.

Parity with /root/reference/pysph/sph/rigid_body.py.  The per-body
reductions of ``RigidBodyMoments`` (total mass, center of mass, inertia,
force, torque) use ``jax.ops.segment_sum`` over ``body_id`` — one fused
pass for all bodies instead of the reference's per-body masked numpy
loops; the body count is static (the shape of the ``total_mass``
constant)."""

import numpy as np
import jax
import jax.numpy as jnp

from pysph_tpu.sph.equation import Equation
from pysph_tpu.sph.integrator_step import IntegratorStep


def skew(vec):
    """Skew-symmetric cross-product matrix (reference rigid_body.py:12)."""
    x, y, z = vec
    return np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]])


class RigidBodyMoments(Equation):
    """Per-body mass/CM/inertia/force/torque reductions and omega_dot
    (reference rigid_body.py:69)."""

    def reduce(self, dst, t, dt):
        nbody = dst.total_mass[:].shape[0]
        mask = dst.active
        body = jnp.where(mask, dst.body_id[:], nbody)

        def seg(v):
            return jax.ops.segment_sum(jnp.where(mask, v, 0.0), body,
                                       num_segments=nbody + 1)[:nbody]

        m = dst.m[:]
        x, y, z = dst.x[:], dst.y[:], dst.z[:]
        fx, fy, fz = dst.fx[:], dst.fy[:], dst.fz[:]

        M = seg(m)
        cx = seg(m * x) / M
        cy = seg(m * y) / M
        cz = seg(m * z) / M
        # second moments about the origin -> parallel axis to the CM
        ixx = seg(m * (y * y + z * z)) - (cy * cy + cz * cz) * M
        iyy = seg(m * (x * x + z * z)) - (cx * cx + cz * cz) * M
        izz = seg(m * (x * x + y * y)) - (cx * cx + cy * cy) * M
        ixy = -seg(m * x * y) + cx * cy * M
        ixz = -seg(m * x * z) + cx * cz * M
        iyz = -seg(m * y * z) + cy * cz * M
        Fx, Fy, Fz = seg(fx), seg(fy), seg(fz)
        tx = seg(y * fz - z * fy) - (cy * Fz - cz * Fy)
        ty = seg(z * fx - x * fz) - (-cx * Fz + cz * Fx)
        tz = seg(x * fy - y * fx) - (cx * Fy - cy * Fx)

        dst.total_mass[:] = M
        dst.cm[:] = jnp.stack([cx, cy, cz], axis=1).reshape(-1)
        dst.force[:] = jnp.stack([Fx, Fy, Fz], axis=1).reshape(-1)
        dst.ac[:] = jnp.stack([Fx / M, Fy / M, Fz / M],
                              axis=1).reshape(-1)
        dst.torque[:] = jnp.stack([tx, ty, tz], axis=1).reshape(-1)
        # store the CM inertia tensor in mi (row-major 3x3 per body,
        # first 9 slots of each body's 16-wide block like the reference)
        I = jnp.stack([
            jnp.stack([ixx, ixy, ixz], axis=1),
            jnp.stack([ixy, iyy, iyz], axis=1),
            jnp.stack([ixz, iyz, izz], axis=1)], axis=1)  # (nb, 3, 3)
        mi = jnp.asarray(dst.mi[:]).reshape(nbody, 16)
        mi = mi.at[:, :9].set(I.reshape(nbody, 9))
        dst.mi[:] = mi.reshape(-1)
        # omega_dot = inv(I) (tau - w x (I w))
        w = jnp.asarray(dst.omega[:]).reshape(nbody, 3)
        tau = jnp.stack([tx, ty, tz], axis=1)
        Iw = jnp.einsum('bij,bj->bi', I, w)
        rhs = tau - jnp.cross(w, Iw)
        det = jnp.linalg.det(I)
        ok = jnp.abs(det) > 1e-12
        I_safe = jnp.where(ok[:, None, None], I,
                           jnp.broadcast_to(jnp.eye(3), I.shape))
        wdot = jnp.linalg.solve(I_safe, rhs[..., None])[..., 0]
        wdot = jnp.where(ok[:, None], wdot, 0.0)
        dst.omega_dot[:] = wdot.reshape(-1)


class RigidBodyMotion(Equation):
    """Set particle velocities from body CM velocity + rotation
    (reference rigid_body.py:215)."""

    def initialize(self, d_idx, d_x, d_y, d_z, d_u, d_v, d_w,
                   d_cm, d_vc, d_omega, d_body_id):
        base = d_body_id[d_idx] * 3
        wx = d_omega[base + 0]
        wy = d_omega[base + 1]
        wz = d_omega[base + 2]
        rx = d_x[d_idx] - d_cm[base + 0]
        ry = d_y[d_idx] - d_cm[base + 1]
        rz = d_z[d_idx] - d_cm[base + 2]
        d_u[d_idx] = d_vc[base + 0] + wy * rz - wz * ry
        d_v[d_idx] = d_vc[base + 1] + wz * rx - wx * rz
        d_w[d_idx] = d_vc[base + 2] + wx * ry - wy * rx


class BodyForce(Equation):
    def __init__(self, dest, sources, gx=0.0, gy=0.0, gz=0.0):
        self.gx = gx
        self.gy = gy
        self.gz = gz
        super(BodyForce, self).__init__(dest, sources)

    def initialize(self, d_idx, d_m, d_fx, d_fy, d_fz):
        d_fx[d_idx] = d_m[d_idx] * self.gx
        d_fy[d_idx] = d_m[d_idx] * self.gy
        d_fz[d_idx] = d_m[d_idx] * self.gz


class SummationDensityBoundary(Equation):
    """Density of fluid from a boundary/rigid body
    (reference rigid_body.py:245)."""

    def __init__(self, dest, sources, fluid_rho=1000.0):
        self.fluid_rho = fluid_rho
        super(SummationDensityBoundary, self).__init__(dest, sources)

    def loop(self, d_idx, d_rho, s_idx, s_V, WIJ):
        d_rho[d_idx] += self.fluid_rho * s_V[s_idx] * WIJ


class NumberDensity(Equation):
    def initialize(self, d_idx, d_V):
        d_V[d_idx] = 0.0

    def loop(self, d_idx, d_V, WIJ):
        d_V[d_idx] += WIJ


class SummationDensityRigidBody(Equation):
    def __init__(self, dest, sources, rho0):
        self.rho0 = rho0
        super(SummationDensityRigidBody, self).__init__(dest, sources)

    def initialize(self, d_idx, d_rho):
        d_rho[d_idx] = 0.0

    def loop(self, d_idx, d_rho, s_idx, s_V, WIJ):
        d_rho[d_idx] += self.rho0 / s_V[s_idx] * WIJ


class ViscosityRigidBody(Equation):
    """Viscous fluid<->body interaction, Akinci 2012; accumulates the
    reaction force into the source body (reference rigid_body.py:280)."""

    def __init__(self, dest, sources, rho0, nu):
        self.nu = nu
        self.rho0 = rho0
        super(ViscosityRigidBody, self).__init__(dest, sources)

    def loop(self, d_idx, d_m, d_au, d_av, d_aw, d_rho,
             s_idx, s_V, s_fx, s_fy, s_fz,
             EPS, VIJ, XIJ, R2IJ, DWIJ):
        phi_b = self.rho0 / (s_V[s_idx] * d_rho[d_idx])
        vijdotxij = jnp.minimum(
            VIJ[0] * XIJ[0] + VIJ[1] * XIJ[1] + VIJ[2] * XIJ[2], 0.0)
        fac = self.nu * phi_b * vijdotxij / (R2IJ + EPS)
        ax = fac * DWIJ[0]
        ay = fac * DWIJ[1]
        az = fac * DWIJ[2]
        d_au[d_idx] += ax
        d_av[d_idx] += ay
        d_aw[d_idx] += az
        s_fx[s_idx] += -d_m[d_idx] * ax
        s_fy[s_idx] += -d_m[d_idx] * ay
        s_fz[s_idx] += -d_m[d_idx] * az


class PressureRigidBody(Equation):
    """Pressure fluid<->body interaction, Akinci 2012
    (reference rigid_body.py:311)."""

    def __init__(self, dest, sources, rho0):
        self.rho0 = rho0
        super(PressureRigidBody, self).__init__(dest, sources)

    def loop(self, d_idx, d_m, d_rho, d_au, d_av, d_aw, d_p,
             s_idx, s_V, s_fx, s_fy, s_fz, DWIJ):
        rho1 = 1.0 / d_rho[d_idx]
        fac = -d_p[d_idx] * rho1 * rho1 * self.rho0 / s_V[s_idx]
        ax = fac * DWIJ[0]
        ay = fac * DWIJ[1]
        az = fac * DWIJ[2]
        d_au[d_idx] += ax
        d_av[d_idx] += ay
        d_aw[d_idx] += az
        s_fx[s_idx] += -d_m[d_idx] * ax
        s_fy[s_idx] += -d_m[d_idx] * ay
        s_fz[s_idx] += -d_m[d_idx] * az


class AkinciRigidFluidCoupling(Equation):
    """Akinci/Liu rigid-fluid coupling (reference rigid_body.py:338)."""

    def __init__(self, dest, sources, fluid_rho=1000):
        super(AkinciRigidFluidCoupling, self).__init__(dest, sources)
        self.fluid_rho = fluid_rho

    def loop(self, d_idx, d_m, d_rho, d_au, d_av, d_aw, d_p,
             s_idx, s_V, s_fx, s_fy, s_fz, DWIJ):
        psi = s_V[s_idx] * self.fluid_rho
        _t1 = 2 * d_p[d_idx] / (d_rho[d_idx] ** 2)
        d_au[d_idx] += -psi * _t1 * DWIJ[0]
        d_av[d_idx] += -psi * _t1 * DWIJ[1]
        d_aw[d_idx] += -psi * _t1 * DWIJ[2]
        s_fx[s_idx] += d_m[d_idx] * psi * _t1 * DWIJ[0]
        s_fy[s_idx] += d_m[d_idx] * psi * _t1 * DWIJ[1]
        s_fz[s_idx] += d_m[d_idx] * psi * _t1 * DWIJ[2]


class LiuFluidForce(Equation):
    """Symmetric pressure coupling (reference rigid_body.py:378)."""

    def __init__(self, dest, sources):
        super(LiuFluidForce, self).__init__(dest, sources)

    def loop(self, d_idx, d_m, d_rho, d_au, d_av, d_aw, d_p,
             s_idx, s_m, s_p, s_rho, s_fx, s_fy, s_fz, DWIJ):
        _t1 = s_p[s_idx] / (s_rho[s_idx] ** 2) + \
            d_p[d_idx] / (d_rho[d_idx] ** 2)
        d_au[d_idx] += -s_m[s_idx] * _t1 * DWIJ[0]
        d_av[d_idx] += -s_m[s_idx] * _t1 * DWIJ[1]
        d_aw[d_idx] += -s_m[s_idx] * _t1 * DWIJ[2]
        s_fx[s_idx] += d_m[d_idx] * s_m[s_idx] * _t1 * DWIJ[0]
        s_fy[s_idx] += d_m[d_idx] * s_m[s_idx] * _t1 * DWIJ[1]
        s_fz[s_idx] += d_m[d_idx] * s_m[s_idx] * _t1 * DWIJ[2]


class RigidBodyForceGPUGems(Equation):
    """Penalty contact force (reference rigid_body.py:414)."""

    def __init__(self, dest, sources, k=1.0, d=1.0, eta=1.0, kt=1.0):
        self.k = k
        self.d = d
        self.eta = eta
        self.kt = kt
        super(RigidBodyForceGPUGems, self).__init__(dest, sources)

    def loop(self, d_idx, d_fx, d_fy, d_fz, d_h, d_total_mass, XIJ,
             RIJ, R2IJ, VIJ):
        vijdotrij = (VIJ[0] * XIJ[0] + VIJ[1] * XIJ[1] +
                     VIJ[2] * XIJ[2])
        near = RIJ > 1e-9
        safe_r = jnp.where(near, RIJ, 1.0)
        safe_r2 = jnp.where(near, R2IJ, 1.0)
        vijdotrij_r2ij = jnp.where(near, vijdotrij / safe_r2, 0.0)
        nij_x = jnp.where(near, XIJ[0] / safe_r, 0.0)
        nij_y = jnp.where(near, XIJ[1] / safe_r, 0.0)
        nij_z = jnp.where(near, XIJ[2] / safe_r, 0.0)
        vijt_x = VIJ[0] - vijdotrij_r2ij * XIJ[0]
        vijt_y = VIJ[1] - vijdotrij_r2ij * XIJ[1]
        vijt_z = VIJ[2] - vijdotrij_r2ij * XIJ[2]
        d_ = self.d * d_h[d_idx]
        fac = self.k * d_total_mass[0] / d_ * \
            jnp.maximum(d_ - RIJ, 0.0)
        d_fx[d_idx] += fac * nij_x - self.eta * VIJ[0] - \
            self.kt * vijt_x
        d_fy[d_idx] += fac * nij_y - self.eta * VIJ[1] - \
            self.kt * vijt_y
        d_fz[d_idx] += fac * nij_z - self.eta * VIJ[2] - \
            self.kt * vijt_z


class RigidBodyCollision(Equation):
    """DEM contact force between rigid spheres
    (reference rigid_body.py:457)."""

    def __init__(self, dest, sources, kn=1e3, mu=0.5, en=0.8):
        self.kn = kn
        self.kt = 2. / 7. * kn
        m_eff = np.pi * 0.5 ** 2 * 1e-6 * 2120
        self.gamma_n = -(2 * np.sqrt(kn * m_eff) * np.log(en)) / (
            np.sqrt(np.pi ** 2 + np.log(en) ** 2))
        self.gamma_t = 0.5 * self.gamma_n
        self.mu = mu
        super(RigidBodyCollision, self).__init__(dest, sources)

    def loop(self, d_idx, d_fx, d_fy, d_fz, d_h, d_total_mass, d_rad_s,
             d_tang_disp_x, d_tang_disp_y, d_tang_disp_z,
             d_tang_velocity_x, d_tang_velocity_y, d_tang_velocity_z,
             s_idx, s_rad_s, XIJ, RIJ, R2IJ, VIJ):
        near = RIJ > 1e-9
        safe_r = jnp.where(near, RIJ, 1.0)
        overlap = jnp.where(near,
                            d_rad_s[d_idx] + s_rad_s[s_idx] - RIJ, 0.0)
        touch = overlap > 0

        nij_x = -XIJ[0] / safe_r
        nij_y = -XIJ[1] / safe_r
        nij_z = -XIJ[2] / safe_r
        vijdotnij = (VIJ[0] * nij_x + VIJ[1] * nij_y + VIJ[2] * nij_z)
        vijn_x = vijdotnij * nij_x
        vijn_y = vijdotnij * nij_y
        vijn_z = vijdotnij * nij_z
        fn_x = -self.kn * overlap * nij_x - self.gamma_n * vijn_x
        fn_y = -self.kn * overlap * nij_y - self.gamma_n * vijn_y
        fn_z = -self.kn * overlap * nij_z - self.gamma_n * vijn_z

        tvx = VIJ[0] - vijn_x
        tvy = VIJ[1] - vijn_y
        tvz = VIJ[2] - vijn_z
        _tang = jnp.sqrt(tvx * tvx + tvy * tvy + tvz * tvz)
        has_t = _tang > 0
        safe_t = jnp.where(has_t, _tang, 1.0)
        tij_x = jnp.where(has_t, tvx / safe_t, 0.0)
        tij_y = jnp.where(has_t, tvy / safe_t, 0.0)
        tij_z = jnp.where(has_t, tvz / safe_t, 0.0)

        ft_x = -self.gamma_t * tvx - self.kt * d_tang_disp_x[d_idx]
        ft_y = -self.gamma_t * tvy - self.kt * d_tang_disp_y[d_idx]
        ft_z = -self.gamma_t * tvz - self.kt * d_tang_disp_z[d_idx]
        ftij = jnp.sqrt(ft_x ** 2 + ft_y ** 2 + ft_z ** 2)
        fnij = jnp.sqrt(fn_x ** 2 + fn_y ** 2 + fn_z ** 2)
        _fnij = self.mu * fnij
        coulomb = _fnij < ftij
        ft_x = jnp.where(coulomb, -_fnij * tij_x, ft_x)
        ft_y = jnp.where(coulomb, -_fnij * tij_y, ft_y)
        ft_z = jnp.where(coulomb, -_fnij * tij_z, ft_z)

        d_fx[d_idx] += jnp.where(touch, fn_x + ft_x, 0.0)
        d_fy[d_idx] += jnp.where(touch, fn_y + ft_y, 0.0)
        d_fz[d_idx] += jnp.where(touch, fn_z + ft_z, 0.0)
        # the reference's per-pair tangential state is ill-defined under
        # parallel iteration (last write wins); reset like the no-touch
        # branch does
        d_tang_velocity_x[d_idx] = 0.0
        d_tang_velocity_y[d_idx] = 0.0
        d_tang_velocity_z[d_idx] = 0.0


class RigidBodyWallCollision(Equation):
    """DEM contact with a wall defined by normals
    (reference rigid_body.py:575)."""

    def __init__(self, dest, sources, kn=1e3, mu=0.5, en=0.8):
        self.kn = kn
        self.kt = 2. / 7. * kn
        m_eff = np.pi * 0.5 ** 2 * 1e-6 * 2120
        self.gamma_n = -(2 * np.sqrt(kn * m_eff) * np.log(en)) / (
            np.sqrt(np.pi ** 2 + np.log(en) ** 2))
        self.gamma_t = 0.5 * self.gamma_n
        self.mu = mu
        super(RigidBodyWallCollision, self).__init__(dest, sources)

    def loop(self, d_idx, d_fx, d_fy, d_fz, d_h, d_total_mass, d_rad_s,
             d_tang_disp_x, d_tang_disp_y, d_tang_disp_z,
             d_tang_velocity_x, d_tang_velocity_y, d_tang_velocity_z,
             s_idx, XIJ, RIJ, R2IJ, VIJ, s_nx, s_ny, s_nz):
        overlap = d_rad_s[d_idx] - (
            XIJ[0] * s_nx[s_idx] + XIJ[1] * s_ny[s_idx] +
            XIJ[2] * s_nz[s_idx])
        touch = overlap > 0
        nij_x = -s_nx[s_idx]
        nij_y = -s_ny[s_idx]
        nij_z = -s_nz[s_idx]
        vijdotnij = (VIJ[0] * nij_x + VIJ[1] * nij_y + VIJ[2] * nij_z)
        vijn_x = vijdotnij * nij_x
        vijn_y = vijdotnij * nij_y
        vijn_z = vijdotnij * nij_z
        fn_x = -self.kn * overlap * nij_x - self.gamma_n * vijn_x
        fn_y = -self.kn * overlap * nij_y - self.gamma_n * vijn_y
        fn_z = -self.kn * overlap * nij_z - self.gamma_n * vijn_z
        tvx = VIJ[0] - vijn_x
        tvy = VIJ[1] - vijn_y
        tvz = VIJ[2] - vijn_z
        _tang = jnp.sqrt(tvx * tvx + tvy * tvy + tvz * tvz)
        has_t = _tang > 0
        safe_t = jnp.where(has_t, _tang, 1.0)
        tij_x = jnp.where(has_t, tvx / safe_t, 0.0)
        tij_y = jnp.where(has_t, tvy / safe_t, 0.0)
        tij_z = jnp.where(has_t, tvz / safe_t, 0.0)
        ft_x = -self.gamma_t * tvx - self.kt * d_tang_disp_x[d_idx]
        ft_y = -self.gamma_t * tvy - self.kt * d_tang_disp_y[d_idx]
        ft_z = -self.gamma_t * tvz - self.kt * d_tang_disp_z[d_idx]
        ftij = jnp.sqrt(ft_x ** 2 + ft_y ** 2 + ft_z ** 2)
        fnij = jnp.sqrt(fn_x ** 2 + fn_y ** 2 + fn_z ** 2)
        _fnij = self.mu * fnij
        coulomb = _fnij < ftij
        ft_x = jnp.where(coulomb, -_fnij * tij_x, ft_x)
        ft_y = jnp.where(coulomb, -_fnij * tij_y, ft_y)
        ft_z = jnp.where(coulomb, -_fnij * tij_z, ft_z)
        d_fx[d_idx] += jnp.where(touch, fn_x + ft_x, 0.0)
        d_fy[d_idx] += jnp.where(touch, fn_y + ft_y, 0.0)
        d_fz[d_idx] += jnp.where(touch, fn_z + ft_z, 0.0)


class EulerStepRigidBody(IntegratorStep):
    """Euler step for rigid bodies (reference rigid_body.py:695); the
    per-body constants update vectorizes over all bodies at once."""

    def stage1(self, d_idx, d_u, d_v, d_w, d_x, d_y, d_z,
               d_omega, d_omega_dot, d_vc, d_ac, d_num_body, dt):
        d_vc[:] = d_vc[:] + d_ac[:] * dt
        d_omega[:] = d_omega[:] + d_omega_dot[:] * dt
        d_x[d_idx] += dt * d_u[d_idx]
        d_y[d_idx] += dt * d_v[d_idx]
        d_z[d_idx] += dt * d_w[d_idx]


class RK2StepRigidBody(IntegratorStep):
    """RK2 step for rigid bodies (reference rigid_body.py:718)."""

    def initialize(self, d_idx, d_x, d_y, d_z, d_x0, d_y0, d_z0,
                   d_omega, d_omega0, d_vc, d_vc0, d_num_body):
        d_vc0[:] = d_vc[:]
        d_omega0[:] = d_omega[:]
        d_x0[d_idx] = d_x[d_idx]
        d_y0[d_idx] = d_y[d_idx]
        d_z0[d_idx] = d_z[d_idx]

    def stage1(self, d_idx, d_u, d_v, d_w, d_x, d_y, d_z, d_x0, d_y0,
               d_z0, d_omega, d_omega_dot, d_vc, d_ac, d_omega0,
               d_vc0, d_num_body, dt):
        dtb2 = 0.5 * dt
        d_vc[:] = d_vc0[:] + d_ac[:] * dtb2
        d_omega[:] = d_omega0[:] + d_omega_dot[:] * dtb2
        d_x[d_idx] = d_x0[d_idx] + dtb2 * d_u[d_idx]
        d_y[d_idx] = d_y0[d_idx] + dtb2 * d_v[d_idx]
        d_z[d_idx] = d_z0[d_idx] + dtb2 * d_w[d_idx]

    def stage2(self, d_idx, d_u, d_v, d_w, d_x, d_y, d_z, d_x0, d_y0,
               d_z0, d_omega, d_omega_dot, d_vc, d_ac, d_omega0,
               d_vc0, d_num_body, dt):
        d_vc[:] = d_vc0[:] + d_ac[:] * dt
        d_omega[:] = d_omega0[:] + d_omega_dot[:] * dt
        d_x[d_idx] = d_x0[d_idx] + dt * d_u[d_idx]
        d_y[d_idx] = d_y0[d_idx] + dt * d_v[d_idx]
        d_z[d_idx] = d_z0[d_idx] + dt * d_w[d_idx]
