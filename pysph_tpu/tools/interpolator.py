"""Interpolate particle properties onto arbitrary points/grids
(parity with /root/reference/pysph/tools/interpolator.py).

Methods: 'shepard', 'sph', 'order1' (first-order moment-matrix
consistency, Liu & Liu 2006), 'splash', 'splash_norm'.  The per-point
4x4 solves of 'order1' become one batched ``jnp.linalg.solve``.
"""

import jax.numpy as jnp
import numpy as np

from pysph_tpu.base.kernels import Gaussian
from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.sph.equation import Equation
from pysph_tpu.tools.sph_evaluator import SPHEvaluator


class InterpolateFunction(Equation):
    """Shepard interpolation (reference interpolator.py:18)."""

    def initialize(self, d_idx, d_prop, d_number_density):
        d_prop[d_idx] = 0.0
        d_number_density[d_idx] = 0.0

    def loop(self, s_idx, d_idx, s_temp_prop, d_prop, d_number_density,
             WIJ):
        d_number_density[d_idx] += WIJ
        d_prop[d_idx] += WIJ * s_temp_prop[s_idx]

    def post_loop(self, d_idx, d_prop, d_number_density):
        nd = d_number_density[d_idx]
        d_prop[d_idx] = jnp.where(nd > 1e-12,
                                  d_prop[d_idx] / jnp.where(nd > 1e-12,
                                                            nd, 1.0),
                                  d_prop[d_idx])


class InterpolateSPH(Equation):
    """Plain SPH interpolation (reference interpolator.py:32)."""

    def initialize(self, d_idx, d_prop):
        d_prop[d_idx] = 0.0

    def loop(self, d_idx, s_idx, s_rho, s_m, s_temp_prop, d_prop, WIJ):
        d_prop[d_idx] += s_m[s_idx] / s_rho[s_idx] * WIJ * \
            s_temp_prop[s_idx]


class SPLASHInterpolateProperty(Equation):
    """SPLASH-style interpolation with the dest-h kernel
    (reference interpolator.py:40)."""

    def initialize(self, d_idx, d_prop):
        d_prop[d_idx] = 0.0

    def loop(self, d_idx, s_idx, s_rho, s_m, s_temp_prop, d_prop, WI):
        d_prop[d_idx] += (s_m[s_idx] / s_rho[s_idx]) * WI * \
            s_temp_prop[s_idx]


class SPLASHInterpolatePropertyNormalized(Equation):
    """Normalized SPLASH interpolation (reference interpolator.py:48)."""

    def initialize(self, d_idx, d_unity, d_prop):
        d_unity[d_idx] = 0.0
        d_prop[d_idx] = 0.0

    def loop(self, d_idx, s_idx, s_rho, s_m, s_temp_prop, WJ, d_unity,
             d_prop):
        common = (s_m[s_idx] / s_rho[s_idx]) * WJ
        d_unity[d_idx] += common
        d_prop[d_idx] += common * s_temp_prop[s_idx]

    def post_loop(self, d_idx, d_unity, d_prop):
        u = d_unity[d_idx]
        d_prop[d_idx] = jnp.where(
            u > 1e-12, d_prop[d_idx] / jnp.where(u > 1e-12, u, 1.0),
            d_prop[d_idx])


class SPHFirstOrderApproximationPreStep(Equation):
    """Moment matrix for first-order consistency
    (reference interpolator.py:64)."""

    def __init__(self, dest, sources, dim=1):
        self.dim = dim
        super(SPHFirstOrderApproximationPreStep, self).__init__(
            dest, sources)

    def initialize(self, d_idx, d_moment):
        for i in range(16):
            d_moment[16 * d_idx + i] = 0.0

    def loop(self, d_idx, s_idx, s_rho, s_m, WIJ, XIJ, DWIJ, d_moment):
        Vj = s_m[s_idx] / s_rho[s_idx]
        d_moment[16 * d_idx + 0] += WIJ * Vj
        for j in range(3):
            d_moment[16 * d_idx + 1 + j] += -XIJ[j] * WIJ * Vj
        for i in range(3):
            d_moment[16 * d_idx + 4 * (i + 1)] += DWIJ[i] * Vj
            for j in range(3):
                d_moment[16 * d_idx + 4 * (i + 1) + 1 + j] += \
                    -XIJ[j] * DWIJ[i] * Vj


class SPHFirstOrderApproximation(Equation):
    """First-order SPH approximation, Liu & Liu 2006
    (reference interpolator.py:106): solves the 4x4 moment system per
    point; batched linear solve on TPU."""

    def __init__(self, dest, sources, dim=1):
        self.dim = dim
        super(SPHFirstOrderApproximation, self).__init__(dest, sources)

    def initialize(self, d_idx, d_prop, d_p_sph):
        for i in range(4):
            d_prop[4 * d_idx + i] = 0.0
            d_p_sph[4 * d_idx + i] = 0.0

    def loop(self, d_idx, s_idx, s_rho, s_m, WIJ, DWIJ, s_temp_prop,
             d_p_sph):
        Vj = s_m[s_idx] / s_rho[s_idx]
        pj = s_temp_prop[s_idx]
        d_p_sph[4 * d_idx + 0] += pj * WIJ * Vj
        d_p_sph[4 * d_idx + 1] += pj * DWIJ[0] * Vj
        d_p_sph[4 * d_idx + 2] += pj * DWIJ[1] * Vj
        d_p_sph[4 * d_idx + 3] += pj * DWIJ[2] * Vj

    def post_loop(self, d_idx, d_moment, d_prop, d_p_sph):
        n = self.dim + 1
        rows = []
        for i in range(n):
            rows.append(jnp.stack(
                [d_moment[16 * d_idx + 4 * i + j] for j in range(n)],
                axis=-1))
        A = jnp.stack(rows, axis=-2)           # (N, n, n)
        b = jnp.stack([d_p_sph[4 * d_idx + i] for i in range(n)],
                      axis=-1)                 # (N, n)
        # guard singular matrices (points with no neighbors)
        det = jnp.linalg.det(A)
        ok = jnp.abs(det) > 1e-12
        eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
        A_safe = jnp.where(ok[:, None, None], A, eye)
        res = jnp.linalg.solve(A_safe, b[..., None])[..., 0]
        res = jnp.where(ok[:, None], res, 0.0)
        for i in range(n):
            d_prop[4 * d_idx + i] = res[:, i]
        for i in range(n, 4):
            d_prop[4 * d_idx + i] = 0.0


def get_bounding_box(particle_arrays, tight=False, stretch=0.05):
    """Bounds of the given arrays (reference interpolator.py:176)."""
    xmin = ymin = zmin = 1e20
    xmax = ymax = zmax = -1e20
    for pa in particle_arrays:
        x, y, z = pa.x, pa.y, pa.z
        xmin, xmax = min(xmin, x.min()), max(xmax, x.max())
        ymin, ymax = min(ymin, y.min()), max(ymax, y.max())
        zmin, zmax = min(zmin, z.min()), max(zmax, z.max())
    bounds = np.asarray((xmin, xmax, ymin, ymax, zmin, zmax))
    if not tight:
        lengths = stretch * np.repeat(bounds[1::2] - bounds[::2], 2)
        lengths[::2] *= -1.0
        bounds += lengths
    return bounds


def get_nx_ny_nz(num_points, bounds):
    """Uniform-mesh shape with approximately num_points points
    (reference interpolator.py:205)."""
    bounds = np.asarray(bounds, dtype=float)
    length = bounds[1::2] - bounds[::2]
    total_length = length.sum()
    rel_length = length / total_length
    non_zero = rel_length > 1e-3
    dim = int(non_zero.sum())
    volume = np.prod(length[non_zero])
    delta = pow(volume / num_points, 1.0 / dim)
    dims = np.ones(3, dtype=int)
    for i in range(3):
        if rel_length[i] > 1e-4:
            dims[i] = int(round(length[i] / delta))
    return dims


class Interpolator(object):
    """Interpolate particle properties onto a grid or points
    (reference interpolator.py:225)."""

    METHODS = ['shepard', 'sph', 'order1', 'splash', 'splash_norm']

    def __init__(self, particle_arrays, num_points=125000, kernel=None,
                 x=None, y=None, z=None, domain_manager=None,
                 equations=None, method='shepard'):
        self._set_particle_arrays(particle_arrays)
        bounds = get_bounding_box(self.particle_arrays)
        shape = get_nx_ny_nz(num_points, bounds)
        self.dim = 3 - list(shape).count(1)
        self.kernel = kernel if kernel is not None else \
            Gaussian(dim=self.dim)
        self.pa = None
        self.nnps = None
        self.equations = equations
        self.func_eval = None
        self.domain_manager = domain_manager
        self.method = method
        if method not in self.METHODS:
            raise RuntimeError('%s method is not implemented' % method)
        if x is None and y is None and z is None:
            self.set_domain(bounds, shape)
        else:
            self.set_interpolation_points(x=x, y=y, z=z)

    # ## Interpolator protocol ##########################################
    def set_interpolation_points(self, x=None, y=None, z=None):
        tmp = None
        for tmp in (x, y, z):
            if tmp is not None:
                break
        if tmp is None:
            raise RuntimeError('At least one non-None array must be '
                               'given.')

        def _get(_t):
            return np.asarray(_t) if _t is not None else \
                np.zeros_like(tmp)

        x, y, z = _get(x), _get(y), _get(z)
        self.shape = x.shape
        self.pa = self._create_particle_array(x, y, z)
        self._make_evaluator()

    def set_domain(self, bounds, shape):
        self.bounds = np.asarray(bounds)
        self.shape = np.asarray(shape)
        b, n = self.bounds, self.shape
        x, y, z = np.mgrid[b[0]:b[1]:n[0] * 1j, b[2]:b[3]:n[1] * 1j,
                           b[4]:b[5]:n[2] * 1j]
        self.set_interpolation_points(x, y, z)

    def interpolate(self, prop, comp=0):
        """Interpolate the named property (returns a suitably shaped
        array; comp selects the gradient component for 'order1')."""
        assert isinstance(comp, int)
        for array in self.particle_arrays:
            if prop in array.properties:
                data = array.get(prop, only_real_particles=False)
            else:
                data = 0.0
            array.get('temp_prop', only_real_particles=False)[:] = data
        self._evaluator.evaluate()
        if self.method != 'order1':
            if comp:
                raise RuntimeError(
                    "use 'order1' to evaluate gradients")
            result = np.array(self.pa.prop)
        else:
            if comp > 3:
                raise RuntimeError('Only comp in 0..3 allowed')
            result = np.array(self.pa.properties['prop'][comp::4])
        result.shape = self.shape
        return result.squeeze()

    def update(self, update_domain=True):
        pass

    def update_particle_arrays(self, particle_arrays):
        self._set_particle_arrays(particle_arrays)
        self._make_evaluator()

    # ### Private protocol ##############################################
    def _set_particle_arrays(self, particle_arrays):
        self.particle_arrays = particle_arrays
        for pa in self.particle_arrays:
            if 'temp_prop' not in pa.properties:
                pa.add_property('temp_prop')

    def _get_max_h_in_arrays(self):
        return max(float(pa.h.max()) for pa in self.particle_arrays)

    def _create_particle_array(self, x, y, z):
        xr, yr, zr = x.ravel(), y.ravel(), z.ravel()
        self.x, self.y, self.z = x.squeeze(), y.squeeze(), z.squeeze()
        hmax = self._get_max_h_in_arrays()
        pa = get_particle_array(
            name='interpolate', x=xr, y=yr, z=zr,
            h=hmax * np.ones_like(xr),
            number_density=np.zeros_like(xr))
        if self.method in ('sph', 'shepard', 'splash'):
            pa.add_property('prop')
        elif self.method == 'splash_norm':
            pa.add_property('prop')
            pa.add_property('unity')
        else:
            pa.add_property('moment', stride=16)
            pa.add_property('p_sph', stride=4)
            pa.add_property('prop', stride=4)
        return pa

    def _make_equations(self):
        if self.equations is not None:
            return self.equations
        names = [x.name for x in self.particle_arrays]
        if self.method == 'shepard':
            return [InterpolateFunction(dest='interpolate',
                                        sources=names)]
        elif self.method == 'sph':
            return [InterpolateSPH(dest='interpolate', sources=names)]
        elif self.method == 'splash':
            return [SPLASHInterpolateProperty(dest='interpolate',
                                              sources=names)]
        elif self.method == 'splash_norm':
            return [SPLASHInterpolatePropertyNormalized(
                dest='interpolate', sources=names)]
        else:
            from pysph_tpu.sph.equation import Group
            return [
                Group(equations=[SPHFirstOrderApproximationPreStep(
                    dest='interpolate', sources=names, dim=self.dim)],
                    real=False),
                Group(equations=[SPHFirstOrderApproximation(
                    dest='interpolate', sources=names, dim=self.dim)],
                    real=False),
            ]

    def _make_evaluator(self):
        arrays = self.particle_arrays + [self.pa]
        self._evaluator = SPHEvaluator(
            arrays, self._make_equations(), dim=self.dim,
            kernel=self.kernel, domain_manager=self.domain_manager)


def main(fname, prop, npoint):  # pragma: no cover
    from pysph_tpu.solver.utils import load
    print('Loading', fname)
    data = load(fname)
    arrays = list(data['arrays'].values())
    interp = Interpolator(arrays, num_points=npoint)
    print('Interpolating')
    prop_interp = interp.interpolate(prop)
    print('Visualizing')
    from matplotlib import pyplot as plt
    plt.contourf(interp.x, interp.y, prop_interp)
    plt.xlabel('x')
    plt.ylabel('y')
    plt.colorbar()
    plt.show()


if __name__ == '__main__':  # pragma: no cover
    import sys
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
