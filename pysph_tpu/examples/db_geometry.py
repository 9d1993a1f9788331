"""Dam-break geometries (parity with
/root/reference/pysph/examples/_db_geometry.py), vectorized with numpy
masks instead of per-particle Python loops."""

import numpy

from pysph_tpu.base.utils import get_particle_array_wcsph


class DamBreak3DGeometry(object):
    """SPHERIC Test 2 geometry (reference _db_geometry.py:250)."""

    def __init__(self, container_height=1.0, container_width=1.0,
                 container_length=3.22, fluid_column_height=0.55,
                 fluid_column_width=1.0, fluid_column_length=1.228,
                 obstacle_center_x=2.5, obstacle_center_y=0,
                 obstacle_length=0.16, obstacle_height=0.161,
                 obstacle_width=0.4, nboundary_layers=5,
                 with_obstacle=True, dx=0.02, hdx=1.2, rho0=1000.0):
        self.container_width = container_width
        self.container_length = container_length
        self.container_height = container_height
        self.fluid_column_length = fluid_column_length
        self.fluid_column_width = fluid_column_width
        self.fluid_column_height = fluid_column_height
        self.obstacle_center_x = obstacle_center_x
        self.obstacle_center_y = obstacle_center_y
        self.obstacle_width = obstacle_width
        self.obstacle_length = obstacle_length
        self.obstacle_height = obstacle_height
        self.nboundary_layers = nboundary_layers
        self.dx = dx
        self.hdx = hdx
        self.rho0 = rho0
        self.with_obstacle = with_obstacle

    def get_max_speed(self, g=9.81):
        return numpy.sqrt(2 * g * self.fluid_column_height)

    def create_particles(self, **kwargs):
        dx = self.dx
        ghostlims = self.nboundary_layers * dx
        cl = self.container_length
        ch = self.container_height
        cw2 = 0.5 * self.container_width
        xmin, xmax = -ghostlims, cl + ghostlims
        zmin, zmax = -ghostlims, ch + ghostlims
        ymin, ymax = -cw2 - ghostlims, cw2 + ghostlims
        eps = 0.1 * dx
        xx, yy, zz = numpy.mgrid[xmin:xmax + eps:dx,
                                 ymin:ymax + eps:dx,
                                 zmin:zmax + eps:dx]
        x, y, z = xx.ravel(), yy.ravel(), zz.ravel()

        fmask = ((x > 0) & (x <= self.fluid_column_length) &
                 (y > -cw2) & (y < cw2) &
                 (z > 0) & (z <= self.fluid_column_height))
        obl2 = 0.5 * self.obstacle_length
        obw2 = 0.5 * self.obstacle_width
        ocx, ocy = self.obstacle_center_x, self.obstacle_center_y
        omask = ((x >= ocx - obl2) & (x <= ocx + obl2) &
                 (y >= ocy - obw2) & (y <= ocy + obw2) &
                 (z > 0) & (z <= self.obstacle_height))
        bmask = ((y <= -cw2) | (y >= cw2) | (x >= cl) | (x <= 0) |
                 (z <= 0))

        def make(name, mask):
            return get_particle_array_wcsph(
                name=name, x=x[mask], y=y[mask], z=z[mask])

        fluid = make('fluid', fmask)
        boundary = make('boundary', bmask)
        particles = [fluid, boundary]
        if self.with_obstacle:
            particles.append(make('obstacle', omask))

        h0 = self.hdx * dx
        m0 = self.rho0 * dx ** 3
        for pa in particles:
            pa.m = numpy.full(pa.get_number_of_particles(), m0)
            pa.h = numpy.full(pa.get_number_of_particles(), h0)
            pa.rho = numpy.full(pa.get_number_of_particles(), self.rho0)
        counts = tuple(p.get_number_of_particles() for p in particles)
        print('3D dam break with %d fluid, %d boundary%s particles' %
              (counts[0], counts[1],
               ', %d obstacle' % counts[2] if self.with_obstacle
               else ''))
        for pa in particles[1:]:
            pa.set_output_arrays(['x', 'y', 'z', 'rho', 'm', 'h', 'p',
                                  'tag', 'pid', 'gid'])
        return particles


def create_2D_tank(x1, y1, x2, y2, dx):
    """Open rectangular tank outline between (x1, y1) and (x2, y2)
    (reference _db_geometry.py:29)."""
    yl = numpy.arange(y1, y2 + dx / 2, dx)
    xl = numpy.ones_like(yl) * x1
    yr = numpy.arange(y1, y2 + dx / 2, dx)
    xr = numpy.ones_like(yr) * x2
    xb = numpy.arange(x1 + dx, x2 - dx + dx / 2, dx)
    yb = numpy.ones_like(xb) * y1
    return (numpy.concatenate([xl, xb, xr]),
            numpy.concatenate([yl, yb, yr]))


def create_2D_filled_region(x1, y1, x2, y2, dx):
    x, y = numpy.mgrid[x1:x2 + dx / 2:dx, y1:y2 + dx / 2:dx]
    return x.ravel(), y.ravel()


def create_obstacle(x1, x2, height, dx):
    """Thin two-layer obstacle wall at x1 (reference
    _db_geometry.py:67)."""
    eps = 1e-6
    yli = numpy.arange(dx / 2.0, height + eps, dx)
    xli = numpy.ones_like(yli) * x1
    ylo = numpy.arange(dx, height + dx / 2.0 + eps, dx)
    xlo = numpy.ones_like(ylo) * x1 - dx / 2.0
    return (numpy.concatenate((xli, xlo)),
            numpy.concatenate((yli, ylo)))


class DamBreak2DGeometry(object):
    """2D dam-break tank/fluid-column geometry (reference
    _db_geometry.py:93), with staggered wall/fluid offsets."""

    def __init__(self, container_width=4.0, container_height=3.0,
                 fluid_column_width=1.0, fluid_column_height=2.0,
                 dx=0.03, dy=0.03, nboundary_layers=4, ro=1000.0,
                 co=1.0, with_obstacle=False, beta=1.0,
                 nfluid_offset=2, hdx=1.5, iisph=False,
                 wall_hex_pack=True):
        self.container_width = container_width
        self.container_height = container_height
        self.fluid_column_height = fluid_column_height
        self.fluid_column_width = fluid_column_width
        self.nboundary_layers = nboundary_layers
        self.nfluid_offset = nfluid_offset
        self.beta = beta
        self.hdx = hdx
        self.dx = dx
        self.dy = dy
        self.iisph = iisph
        self.wall_hex_pack = wall_hex_pack
        self.nsolid = 0
        self.nfluid = 0
        self.ro = ro
        self.co = co
        self.with_obstacle = with_obstacle

    def get_wall(self, nboundary_layers=4):
        dx, dy = self.dx / self.beta, self.dy / self.beta
        factor = 0.5 if self.wall_hex_pack else 1.0
        xs, ys = [], []
        for i in range(nboundary_layers):
            xb, yb = create_2D_tank(
                x1=-factor * i * dx, y1=-factor * i * dy,
                x2=self.container_width + factor * i * dx,
                y2=self.container_height, dx=dx)
            xs.append(xb)
            ys.append(yb)
        x = numpy.concatenate(xs)
        y = numpy.concatenate(ys)
        self.nsolid = len(x)
        return x, y

    def get_fluid(self, noffset=2):
        dx = self.dx
        factor = 0.5
        xs, ys = [], []
        for i in range(noffset):
            xf, yf = create_2D_filled_region(
                x1=dx - factor * i * dx, y1=dx - factor * i * dx,
                x2=self.fluid_column_width + factor * i * dx,
                y2=self.fluid_column_height, dx=dx)
            xs.append(xf)
            ys.append(yf)
        x = numpy.concatenate(xs)
        y = numpy.concatenate(ys)
        self.nfluid = len(x)
        return x, y

    def create_particles(self, nboundary_layers=2, nfluid_offset=2,
                         hdx=1.5, **kwargs):
        from pysph_tpu.base.utils import get_particle_array_iisph
        xf, yf = self.get_fluid(nfluid_offset)
        gpa = get_particle_array_iisph if self.iisph else \
            get_particle_array_wcsph
        fluid = gpa(name='fluid', x=xf, y=yf)
        fluid.gid[:] = numpy.arange(
            fluid.get_number_of_particles(), dtype=numpy.uint32)

        xb, yb = self.get_wall(nboundary_layers)
        boundary = gpa(name='boundary', x=xb, y=yb)

        dx, dy, ro = self.dx, self.dy, self.ro
        fluid.h[:] = hdx * dx
        fluid.m[:] = dx * dy * ro * (0.5 if nfluid_offset == 2
                                     else 1.0)
        fluid.rho[:] = ro
        if not self.iisph:
            fluid.rho0[:] = ro
        boundary.h[:] = hdx * dx
        boundary.m[:] = dx * dy * ro * (0.5 if nboundary_layers == 2
                                        else 1.0)
        boundary.rho[:] = ro
        if not self.iisph:
            boundary.rho0[:] = ro

        particles = [fluid, boundary]
        if self.with_obstacle:
            xo, yo = create_obstacle(x1=2.5, x2=2.5 + dx,
                                     height=0.25, dx=dx)
            obstacle = get_particle_array_wcsph(name='obstacle',
                                                x=xo, y=yo)
            obstacle.h[:] = hdx * dx
            obstacle.m[:] = dx * dy * 0.5 * ro
            obstacle.rho[:] = ro
            if not self.iisph:
                obstacle.rho0[:] = ro
            boundary.append_parray(obstacle)

        boundary.gid[:] = numpy.arange(
            boundary.get_number_of_particles(), dtype=numpy.uint32)
        boundary.set_output_arrays(
            ['x', 'y', 'rho', 'm', 'h', 'p', 'tag', 'pid', 'gid'])
        if self.iisph:
            boundary.add_output_arrays(['V'])
        print("2D dam break with %d fluid, %d boundary particles"
              % (fluid.get_number_of_particles(),
                 boundary.get_number_of_particles()))
        return particles
