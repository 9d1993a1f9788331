"""Geometry generators (parity with
/root/reference/pysph/tools/geometry.py): blocks, walls, tanks, circles,
spheres, cylinders, transforms, and overlap removal."""

import numpy as np


def distance(point1, point2=None):
    if point2 is None:
        point2 = np.zeros(3)
    return np.linalg.norm(np.asarray(point1) - np.asarray(point2))


def distance_2d(point1, point2=None):
    if point2 is None:
        point2 = np.zeros(2)
    return np.linalg.norm(np.asarray(point1) - np.asarray(point2))


def translate(x, y, z, x_translate=0.0, y_translate=0.0, z_translate=0.0):
    return (np.asarray(x) + x_translate, np.asarray(y) + y_translate,
            np.asarray(z) + z_translate)


def rotate(x, y, z, axis=None, angle=90.0):
    """Rotate points about ``axis`` by ``angle`` degrees (Rodrigues)."""
    if axis is None:
        axis = np.array([0.0, 0.0, 1.0])
    axis = np.asarray(axis, dtype=float)
    axis = axis / np.linalg.norm(axis)
    theta = np.deg2rad(angle)
    k = axis
    pts = np.stack([np.asarray(x), np.asarray(y), np.asarray(z)])
    kx = np.cross(k, pts.T).T
    kdot = k.dot(pts)
    rot = (pts * np.cos(theta) + kx * np.sin(theta) +
           np.outer(k, kdot) * (1 - np.cos(theta)))
    return rot[0], rot[1], rot[2]


def extrude(x, y, dx=0.01, extrude_dist=1.0, z_center=0.0):
    """Extrude a 2d point set along z."""
    n = int(extrude_dist / dx) + 1
    zs = np.linspace(z_center - extrude_dist / 2.0,
                     z_center + extrude_dist / 2.0, n)
    x = np.asarray(x)
    y = np.asarray(y)
    xo = np.tile(x, n)
    yo = np.tile(y, n)
    zo = np.repeat(zs, x.size)
    return xo, yo, zo


def get_2d_wall(dx=0.01, center=(0.0, 0.0), length=1.0, num_layers=1,
                up=True):
    """Wall parallel to the x-axis with layers stacked in +/-y."""
    x = np.arange(-length / 2.0, length / 2.0 + dx, dx) + center[0]
    sign = 1 if up else -1
    ys = [np.ones_like(x) * (center[1] + sign * i * dx)
          for i in range(num_layers)]
    return np.tile(x, num_layers), np.concatenate(ys)


def get_2d_tank(dx=0.05, base_center=(0.0, 0.0), length=1.0, height=1.0,
                num_layers=1, outside=True, staggered=False, top=False):
    """Open 2d tank: base on the x-axis, side walls along y."""
    dy = dx
    fac = 1 if outside else 0
    if staggered:
        dx = dx / 2
    start = fac * (1 - num_layers) * dx
    end = fac * num_layers * dx + (1 - fac) * dx
    x, y = np.mgrid[start:length + end:dx, start:height + end:dy]
    topset = 0 if top else 10 * height
    if staggered:
        topset += dx
        y[1::2] += dx
    offset = 0 if outside else (num_layers - 1) * dx
    cond = ~((x > offset) & (x < length - offset) &
             (y > offset) & (y < height + topset - offset))
    return (x[cond] + base_center[0] - length / 2,
            y[cond] + base_center[1])


def get_2d_block(dx=0.01, length=1.0, height=1.0, center=(0.0, 0.0)):
    """Filled rectangular block of particles."""
    n1 = int(length / dx) + 1
    n2 = int(height / dx) + 1
    x, y = np.mgrid[-length / 2.0:length / 2.0:n1 * 1j,
                    -height / 2.0:height / 2.0:n2 * 1j]
    return x.ravel() + center[0], y.ravel() + center[1]


def get_2d_circle(dx=0.01, r=0.5, center=(0.0, 0.0)):
    """Filled circular disc."""
    N = int(2.0 * r / dx) + 1
    x, y = np.mgrid[-r:r:N * 1j, -r:r:N * 1j]
    x, y = x.ravel(), y.ravel()
    keep = x * x + y * y <= r * r
    return x[keep] + center[0], y[keep] + center[1]


def get_2d_hollow_circle(dx=0.01, r=1.0, center=(0.0, 0.0),
                         num_layers=2, inside=True):
    """Annulus of ``num_layers`` layers around radius r."""
    width = num_layers * dx
    r_out = r if inside else r + width
    r_in = r - width if inside else r
    N = int(2.0 * r_out / dx) + 1
    x, y = np.mgrid[-r_out:r_out:N * 1j, -r_out:r_out:N * 1j]
    x, y = x.ravel(), y.ravel()
    r2 = x * x + y * y
    keep = (r2 <= r_out * r_out) & (r2 >= r_in * r_in)
    return x[keep] + center[0], y[keep] + center[1]


def get_3d_hollow_cylinder(dx=0.01, r=0.5, length=1.0,
                           center=(0.0, 0.0, 0.0), num_layers=2,
                           inside=True):
    """Hollow cylinder along z."""
    x2, y2 = get_2d_hollow_circle(dx, r, (0.0, 0.0), num_layers, inside)
    x, y, z = extrude(x2, y2, dx, length, 0.0)
    return x + center[0], y + center[1], z + center[2]


def get_3d_block(dx=0.01, length=1.0, height=1.0, depth=1.0,
                 center=(0.0, 0.0, 0.0)):
    """Filled 3d block."""
    n1 = int(length / dx) + 1
    n2 = int(height / dx) + 1
    n3 = int(depth / dx) + 1
    x, y, z = np.mgrid[-length / 2.0:length / 2.0:n1 * 1j,
                       -height / 2.0:height / 2.0:n2 * 1j,
                       -depth / 2.0:depth / 2.0:n3 * 1j]
    return (x.ravel() + center[0], y.ravel() + center[1],
            z.ravel() + center[2])


def get_3d_sphere(dx=0.01, r=0.5, center=(0.0, 0.0, 0.0)):
    """Filled sphere."""
    N = int(2.0 * r / dx) + 1
    x, y, z = np.mgrid[-r:r:N * 1j, -r:r:N * 1j, -r:r:N * 1j]
    x, y, z = x.ravel(), y.ravel(), z.ravel()
    keep = x * x + y * y + z * z <= r * r
    return (x[keep] + center[0], y[keep] + center[1],
            z[keep] + center[2])


def find_overlap_particles(fluid_parray, solid_parray, dx_solid, dim=3):
    """Indices of fluid particles closer than dx_solid to any solid
    particle (reference geometry.py:713)."""
    from scipy.spatial import cKDTree
    cols = ['x', 'y', 'z'][:dim]
    fl = np.stack([np.asarray(fluid_parray.get(c)) for c in cols], axis=1)
    so = np.stack([np.asarray(solid_parray.get(c)) for c in cols], axis=1)
    tree = cKDTree(so)
    d, _ = tree.query(fl, k=1)
    return np.where(d < dx_solid)[0]


def remove_overlap_particles(fluid_parray, solid_parray, dx_solid, dim=3):
    """Remove fluid particles overlapping the solid
    (reference geometry.py:763)."""
    idx = find_overlap_particles(fluid_parray, solid_parray, dx_solid,
                                 dim)
    if len(idx):
        fluid_parray.remove_particles(idx)


def matrix_exp(matrix):
    """Matrix exponential via the scaling-free Taylor series
    (reference geometry.py:25; used by the rotation helper)."""
    A = np.asarray(matrix, dtype=np.float64)
    result = np.eye(A.shape[0])
    term = np.eye(A.shape[0])
    for n in range(1, 64):
        term = term @ A / n
        result = result + term
        denom = np.sqrt(np.sum(result * result))
        if np.sqrt(np.sum(term * term)) <= 1e-16 * denom:
            break
    return result


def _naca_thickness(xc, t):
    """Half-thickness distribution of the NACA 4/5-digit families
    (standard published polynomial)."""
    return 5.0 * t * (0.2969 * np.sqrt(xc) - 0.1260 * xc -
                      0.3516 * xc ** 2 + 0.2843 * xc ** 3 -
                      0.1015 * xc ** 4)


def _fill_airfoil(dx, c, camber_fn, t):
    """Fill the area between the cambered upper/lower surfaces with a
    solid lattice of particles (vectorized; the reference loops over
    candidate points, geometry.py:479-668)."""
    n = int(c / dx) + 1
    gx, gy = np.mgrid[0:c:n * 1j, -c / 2.0:c / 2.0:n * 1j]
    x, y = gx.ravel(), gy.ravel()
    xc = x / c
    yt = _naca_thickness(xc, t)
    yc, dydx = camber_fn(xc)
    theta = np.arctan(dydx)
    upper = y >= 0.0
    keep_u = upper & (y <= yc + yt * np.cos(theta))
    keep_l = ~upper & (y >= yc - yt * np.cos(theta))
    xs = np.where(upper, x - yt * np.sin(theta),
                  x + yt * np.sin(theta))
    keep = keep_u | keep_l
    return xs[keep], y[keep]


def get_4digit_naca_airfoil(dx=0.01, airfoil='0012', c=1.0):
    """Solid 2D NACA 4-digit airfoil (reference geometry.py:479):
    digit 1 = max camber %, digit 2 = camber position / 10, digits
    3-4 = thickness %."""
    t = float(airfoil[2:]) * 0.01 * c
    m = 0.01 * float(airfoil[0])
    p = 0.1 * float(airfoil[1])

    def camber(xc):
        if m == 0.0 or p == 0.0:
            return np.zeros_like(xc), np.zeros_like(xc)
        fore = xc <= p
        yc = np.where(
            fore, (m / p ** 2) * (2 * p * xc - xc ** 2),
            (m / (1 - p) ** 2) * (1 - 2 * p + 2 * p * xc - xc ** 2))
        dydx = np.where(
            fore, (2 * m / p ** 2) * (p - xc) / c,
            (2 * m / (1 - p) ** 2) * (p - xc) / c)
        return yc, dydx

    return _fill_airfoil(dx, c, camber, t)


_NACA5_MK = {
    '210': (0.058, 361.4), '220': (0.126, 51.64),
    '230': (0.2025, 15.957), '240': (0.290, 6.643),
    '250': (0.391, 3.23), '221': (0.130, 51.99),
    '231': (0.217, 15.793), '241': (0.318, 6.52),
    '251': (0.441, 3.191),
}


def get_5digit_naca_airfoil(dx=0.01, airfoil='23112', c=1.0):
    """Solid 2D NACA 5-digit airfoil (reference geometry.py:571);
    camber-line constants from the published m/k table."""
    t = 0.01 * float(airfoil[3:])
    m, k = _NACA5_MK[airfoil[:3]]

    def camber(xc):
        fore = xc <= m
        yc = np.where(
            fore,
            c * (k / 6.0) * (xc ** 3 - 3 * m * xc ** 2 +
                             m * m * (3 - m) * xc),
            c * (k * m ** 3 / 6.0) * (1 - xc))
        dydx = np.where(
            fore,
            (k / 6.0) * (3 * xc ** 2 - 6 * m * xc +
                         m * m * (3 - m)),
            -(k * m ** 3 / 6.0) * np.ones_like(xc))
        return yc, dydx

    return _fill_airfoil(dx, c, camber, t)


def get_naca_wing(dx=0.01, airfoil='0012', span=1.0, chord=1.0):
    """Rectangular wing: a NACA section extruded along z
    (reference geometry.py:636)."""
    if len(airfoil) == 4:
        x, y = get_4digit_naca_airfoil(dx, airfoil, chord)
    else:
        x, y = get_5digit_naca_airfoil(dx, airfoil, chord)
    return extrude(x, y, dx, span)


def evaluate_area_of_triangle(points):
    """Area of the triangle spanned by three 3D points
    (reference geometry.py:670)."""
    p = np.asarray(points, dtype=np.float64)
    return 0.5 * np.linalg.norm(np.cross(p[1] - p[0], p[2] - p[0]))


def remove_repeated_points(x, y, z, dx_triangle):
    """Deduplicate points closer than ~dx_triangle (reference
    geometry.py:698, which uses an SPH fixed-radius query; a sort-grid
    dedup gives the same result without the engine)."""
    pts = np.stack([np.asarray(x), np.asarray(y),
                    np.asarray(z)], axis=1)
    if not len(pts):
        return pts[:, 0], pts[:, 1], pts[:, 2]
    cell = max(float(dx_triangle), 1e-12)
    keys = np.floor(pts / cell).astype(np.int64)
    _, keep = np.unique(keys, axis=0, return_index=True)
    keep.sort()
    return pts[keep, 0], pts[keep, 1], pts[keep, 2]


# ---------------------------------------------------------------------------
# Packed-particle pipelines (reference geometry.py:815-1202): produce
# body-fitted, SPH-relaxation-packed initial distributions and cache
# them next to the application output directory.
# ---------------------------------------------------------------------------
def _load_packing(res_file):
    data = np.load(res_file)
    return (data['xs'], data['ys'], data['zs'],
            data['xf'], data['yf'], data['zf'])


def _save_packing(res_file, xs, ys, zs, xf, yf, zf):
    import os
    os.makedirs(os.path.dirname(res_file) or '.', exist_ok=True)
    np.savez(res_file, xs=xs, ys=ys, zs=zs, xf=xf, yf=yf, zf=zf)


def _relax_packing(free, frozen, dx, dim, scheme_kw=None, domain=None,
                   n_steps=300, project=False):
    """Run the SPH-relaxation packing solve on ``free`` (against
    optional ``frozen`` surface/container nodes), optionally snapping
    the boundary layer onto the surface afterwards."""
    from pysph_tpu.tools.particle_packing import ParticlePacking
    arrays = [free] + ([frozen] if frozen is not None else [])
    s = ParticlePacking(
        [free.name], [], [frozen.name] if frozen is not None else [],
        dim=dim, dx=dx, **(scheme_kw or {}))
    s.setup_properties(arrays)
    s.configure_solver(tf=1e9, dt=1e-3)
    solver = s.get_solver()
    if domain is not None:
        solver.set_domain(domain)
    solver.setup(arrays, s.get_equations(), kernel=solver.kernel)
    solver.set_disable_output(True)
    solver.set_max_steps(n_steps)
    solver.solve(show_progress=False)
    solver._sync_to_host()
    if project and frozen is not None:
        s.project_to_surface(free)
    return free


def get_packed_periodic_packed_particles(add_opt_func, folder, dx, L,
                                         B, H=0, dim=2, dfreq=-1,
                                         pb=None, nu=None, k=None,
                                         tol=1e-2):
    """A periodic packed 2D/3D domain: particles are relaxed to a
    uniform number density instead of sitting on a lattice
    (reference geometry.py:815).  Returns (xs, ys, zs, xf, yf, zf)
    with the solid arrays empty; results are cached per spacing."""
    import os

    from pysph_tpu.base.domain import DomainManager
    from pysph_tpu.tools.packer import get_packing_folders
    from pysph_tpu.tools.particle_packing import (
        create_free_particles_rect)
    _, _, res_file = get_packing_folders(folder, dx)
    if os.path.exists(res_file):
        return _load_packing(res_file)
    if dim == 2:
        bound = (0.0, L, 0.0, B)
        domain = DomainManager(xmin=0, xmax=L, ymin=0, ymax=B,
                               periodic_in_x=True, periodic_in_y=True)
    else:
        bound = (0.0, L, 0.0, B, 0.0, H)
        domain = DomainManager(xmin=0, xmax=L, ymin=0, ymax=B,
                               zmin=0, zmax=H, periodic_in_x=True,
                               periodic_in_y=True, periodic_in_z=True)
    free = create_free_particles_rect(dx, 1.2, 1.0, bound, dim=dim)
    free = _relax_packing(
        free, None, dx, dim,
        scheme_kw=dict(pb=pb, nu=nu, k=k, dfreq=dfreq, tol=tol),
        domain=domain)
    e = np.array([])
    xf, yf, zf = (np.asarray(free.x), np.asarray(free.y),
                  np.asarray(free.z))
    _save_packing(res_file, e, e, e, xf, yf, zf)
    return e, e, e, xf, yf, zf


def _resample_closed_polygon(x, y, dx):
    """Points every ~dx along the closed polyline plus outward unit
    normals (CCW polygon -> right-hand perpendicular of the edge)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    # ensure closure
    if abs(x[0] - x[-1]) > 1e-14 or abs(y[0] - y[-1]) > 1e-14:
        x = np.append(x, x[0])
        y = np.append(y, y[0])
    # signed area > 0 for CCW
    area = 0.5 * np.sum(x[:-1] * y[1:] - x[1:] * y[:-1])
    sgn = 1.0 if area > 0 else -1.0
    px, py, nx, ny = [], [], [], []
    for i in range(len(x) - 1):
        ex, ey = x[i + 1] - x[i], y[i + 1] - y[i]
        elen = np.hypot(ex, ey)
        if elen < 1e-14:
            continue
        n = max(1, int(np.ceil(elen / dx)))
        t = np.arange(n) / n
        px.append(x[i] + t * ex)
        py.append(y[i] + t * ey)
        nx.append(np.full(n, sgn * ey / elen))
        ny.append(np.full(n, -sgn * ex / elen))
    return (np.concatenate(px), np.concatenate(py),
            np.concatenate(nx), np.concatenate(ny))


def _points_in_polygon(px, py, qx, qy):
    """Vectorized even-odd (ray casting) inside test for query points
    (qx, qy) against the closed polygon (px, py)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    if abs(px[0] - px[-1]) > 1e-14 or abs(py[0] - py[-1]) > 1e-14:
        px = np.append(px, px[0])
        py = np.append(py, py[0])
    x0, y0 = px[:-1][None, :], py[:-1][None, :]
    x1, y1 = px[1:][None, :], py[1:][None, :]
    qx = np.asarray(qx, dtype=np.float64)[:, None]
    qy = np.asarray(qy, dtype=np.float64)[:, None]
    cross = (y0 > qy) != (y1 > qy)
    with np.errstate(divide='ignore', invalid='ignore'):
        xint = x0 + (qy - y0) * (x1 - x0) / (y1 - y0)
    hits = cross & (qx < xint)
    return (hits.sum(axis=1) % 2).astype(bool)


def get_packed_2d_particles_from_surface_coordinates(
        add_opt_func, folder, dx, x, y, pb=None, nu=None, k=None,
        scale=1.0, shift=False, dfreq=-1, invert_normal=False,
        hardpoints=None, use_prediction=False, filter_layers=False,
        reduce_dfreq=False, tol=1e-2):
    """Pack particles around a closed 2D surface polyline (reference
    geometry.py:880): the band around the surface is SPH-relaxed
    against frozen surface nodes and the boundary layer is projected
    onto the surface, then split into body (solid, inside) and fluid
    (outside) sets.  Results are cached per spacing."""
    import os

    from pysph_tpu.base.utils import get_particle_array
    from pysph_tpu.tools.packer import get_packing_folders
    from pysph_tpu.tools.particle_packing import (
        create_free_particles_rect, get_packing_props)
    _, _, res_file = get_packing_folders(folder, dx)
    if os.path.exists(res_file):
        return _load_packing(res_file)

    x = np.asarray(x, dtype=np.float64) * scale
    y = np.asarray(y, dtype=np.float64) * scale
    if shift:
        # stagger the surface against the ambient lattice so the
        # packed band blends into a half-spacing-offset grid
        x = x + dx / 2
    sx, sy, snx, sny = _resample_closed_polygon(x, y, dx)
    if invert_normal:
        snx, sny = -snx, -sny
    frozen = get_particle_array(
        name='frozen', x=sx, y=sy, m=dx * dx, rho=1.0, h=1.2 * dx,
        additional_props=get_packing_props())
    frozen.xn[:] = snx
    frozen.yn[:] = sny

    pad = 6 * dx
    bound = (sx.min() - pad, sx.max() + pad,
             sy.min() - pad, sy.max() + pad)
    free = create_free_particles_rect(dx, 1.2, 1.0, bound, dim=2)
    scheme_kw = dict(pb=pb, nu=nu, k=k, dfreq=dfreq, tol=tol,
                     hardpoints=hardpoints)
    free = _relax_packing(free, frozen, dx, 2, scheme_kw=scheme_kw,
                          project=True)
    fx = np.asarray(free.x)
    fy = np.asarray(free.y)
    inside = _points_in_polygon(sx, sy, fx, fy)
    # surface-projected (hard) particles belong to the body
    hard = np.asarray(free.hard) > 0.5
    solid_sel = inside | hard
    xs, ys = fx[solid_sel], fy[solid_sel]
    xf, yf = fx[~solid_sel], fy[~solid_sel]
    zs = np.zeros_like(xs)
    zf = np.zeros_like(xf)
    _save_packing(res_file, xs, ys, zs, xf, yf, zf)
    return xs, ys, zs, xf, yf, zf


def get_packed_2d_particles_from_surface_file(
        add_opt_func, folder, dx, filename, pb=None, nu=None, k=None,
        scale=1.0, shift=False, dfreq=-1, invert_normal=False,
        hardpoints=None, use_prediction=False, filter_layers=False,
        reduce_dfreq=False, tol=1e-2):
    """As get_packed_2d_particles_from_surface_coordinates, with the
    closed polyline read from a two-column text file (reference
    geometry.py:968)."""
    data = np.loadtxt(filename)
    return get_packed_2d_particles_from_surface_coordinates(
        add_opt_func, folder, dx, data[:, 0], data[:, 1], pb=pb,
        nu=nu, k=k, scale=scale, shift=shift, dfreq=dfreq,
        invert_normal=invert_normal, hardpoints=hardpoints,
        use_prediction=use_prediction, filter_layers=filter_layers,
        reduce_dfreq=reduce_dfreq, tol=tol)


def get_packed_3d_particles_from_surface_file(
        add_opt_func, folder, dx, filename, pb=None, nu=None, k=None,
        scale=1.0, shift=False, dfreq=-1, invert_normal=False,
        hardpoints=None, use_prediction=False, filter_layers=False,
        reduce_dfreq=False, tol=1e-2):
    """Pack particles around a closed STL surface (reference
    geometry.py:1055): frozen surface samples with facet normals,
    relaxation in the padded bounding box, voxel-fill inside test for
    the body/fluid split.  Results are cached per spacing."""
    import os

    from pysph_tpu.base.utils import get_particle_array
    from pysph_tpu.tools.mesh_tools import (fill_volume_mesh,
                                            surface_points)
    from pysph_tpu.tools.packer import (_nearest_inside,
                                        get_packing_folders)
    from pysph_tpu.tools.particle_packing import (
        create_free_particles_rect, get_packing_props)
    from pysph_tpu.tools.read_mesh import Mesh
    _, _, res_file = get_packing_folders(folder, dx)
    if os.path.exists(res_file):
        return _load_packing(res_file)

    mesh = Mesh(filename).read()
    mx = np.asarray(mesh.x) * scale
    my = np.asarray(mesh.y) * scale
    mz = np.asarray(mesh.z) * scale
    cells = np.asarray(mesh.cells)
    sx, sy, sz = surface_points(mx, my, mz, cells, dx)
    # outward facet normals, assigned per sample via nearest vertex of
    # the filled voxel test (normals point away from the filled side)
    fxv, fyv, fzv = fill_volume_mesh(mx, my, mz, cells, dx)
    inside_fn = _nearest_inside(fxv, fyv, fzv, dx)
    eps = 0.5 * dx
    nx = np.where(inside_fn(sx + eps, sy, sz), -1.0, 1.0)
    ny = np.where(inside_fn(sx, sy + eps, sz), -1.0, 1.0)
    nz = np.where(inside_fn(sx, sy, sz + eps), -1.0, 1.0)
    mag = np.sqrt(nx * nx + ny * ny + nz * nz)
    nx, ny, nz = nx / mag, ny / mag, nz / mag
    if invert_normal:
        nx, ny, nz = -nx, -ny, -nz
    frozen = get_particle_array(
        name='frozen', x=sx, y=sy, z=sz, m=dx ** 3, rho=1.0,
        h=1.2 * dx, additional_props=get_packing_props())
    frozen.xn[:] = nx
    frozen.yn[:] = ny
    frozen.zn[:] = nz

    pad = 6 * dx
    bound = (sx.min() - pad, sx.max() + pad, sy.min() - pad,
             sy.max() + pad, sz.min() - pad, sz.max() + pad)
    free = create_free_particles_rect(dx, 1.2, 1.0, bound, dim=3)
    scheme_kw = dict(pb=pb, nu=nu, k=k, dfreq=dfreq, tol=tol,
                     hardpoints=hardpoints)
    free = _relax_packing(free, frozen, dx, 3, scheme_kw=scheme_kw,
                          project=True)
    fx = np.asarray(free.x)
    fy = np.asarray(free.y)
    fz = np.asarray(free.z)
    inside = inside_fn(fx, fy, fz)
    hard = np.asarray(free.hard) > 0.5
    solid_sel = inside | hard
    xs, ys, zs = fx[solid_sel], fy[solid_sel], fz[solid_sel]
    xf, yf, zf = fx[~solid_sel], fy[~solid_sel], fz[~solid_sel]
    _save_packing(res_file, xs, ys, zs, xf, yf, zf)
    return xs, ys, zs, xf, yf, zf


def create_fluid_around_packing(dx, xf, yf, L, B, zf=(0.0,), H=0.0,
                                **props):
    """Embed the packed fluid band into a regular ambient lattice of
    extent L x B (x H) and return one fluid particle array (reference
    geometry.py:1141)."""
    from pysph_tpu.base.utils import get_particle_array
    xf = np.asarray(xf)
    yf = np.asarray(yf)
    zf = np.asarray(zf)
    xmin, xmax = xf.min(), xf.max()
    ymin, ymax = yf.min(), yf.max()
    zmin, zmax = zf.min(), zf.max()
    eps = dx / 10
    if H < 1e-14:
        x, y = np.mgrid[dx / 2:L:dx, -B / 2 + dx / 2:B / 2:dx]
        cond = ~((x - xmin + eps > 1e-14) &
                 (x - xmax - eps < 1e-14) &
                 (y - ymin + eps > 1e-14) &
                 (y - ymax - eps < 1e-14))
        x = np.concatenate((x[cond], xf))
        y = np.concatenate((y[cond], yf))
        return get_particle_array(name='fluid', x=x, y=y, **props)
    x, y, z = np.mgrid[dx / 2:L:dx, -B / 2 + dx / 2:B / 2:dx,
                       -H / 2 + dx / 2:H / 2:dx]
    cond = ~((x - xmin + eps > 1e-14) & (x - xmax - eps < 1e-14) &
             (y - ymin + eps > 1e-14) & (y - ymax - eps < 1e-14) &
             (z - zmin + eps > 1e-14) & (z - zmax - eps < 1e-14))
    x = np.concatenate((x[cond], xf))
    y = np.concatenate((y[cond], yf))
    z = np.concatenate((z[cond], zf))
    return get_particle_array(name='fluid', x=x, y=y, z=z, **props)
