"""Tests for SPHEvaluator and Interpolator (mirrors reference
tools/tests/test_interpolator.py strategy: interpolating known fields)."""

import numpy as np
import pytest

from pysph_tpu.base.kernels import CubicSpline, Gaussian
from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.sph.basic_equations import SummationDensity
from pysph_tpu.tools.interpolator import Interpolator
from pysph_tpu.tools.sph_evaluator import SPHEvaluator


def _fluid_block(n=20, dx=0.05):
    span = np.arange(0, n) * dx + dx / 2
    x, y = np.meshgrid(span, span)
    x, y = x.ravel(), y.ravel()
    pa = get_particle_array(
        name='fluid', x=x, y=y, h=np.full(x.size, 1.2 * dx),
        m=np.full(x.size, dx * dx), rho=np.ones(x.size),
        p=2.0 * x + 3.0 * y, u=np.sin(x))
    return pa


def test_sph_evaluator_summation_density():
    pa = _fluid_block()
    ev = SPHEvaluator([pa], [SummationDensity('fluid', ['fluid'])],
                      dim=2, kernel=CubicSpline(dim=2))
    ev.evaluate()
    rho = pa.rho
    # interior particles should be near 1.0
    interior = rho[(pa.x > 0.2) & (pa.x < 0.8) &
                   (pa.y > 0.2) & (pa.y < 0.8)]
    np.testing.assert_allclose(interior, 1.0, rtol=2e-2)


def test_interpolator_shepard_constant_field():
    pa = _fluid_block()
    pa.p = np.ones_like(pa.p)
    interp = Interpolator([pa], num_points=400,
                          kernel=Gaussian(dim=2))
    p = interp.interpolate('p')
    assert p.shape == tuple(np.asarray(interp.shape).squeeze()[
        np.asarray(interp.shape).squeeze() > 1])
    np.testing.assert_allclose(p, 1.0, rtol=1e-10)


def test_interpolator_given_points_linear_field():
    pa = _fluid_block()
    xs = np.array([0.3, 0.5, 0.7])
    ys = np.array([0.5, 0.5, 0.5])
    interp = Interpolator([pa], x=xs, y=ys, kernel=Gaussian(dim=2))
    p = interp.interpolate('p')
    expected = 2.0 * xs + 3.0 * ys
    np.testing.assert_allclose(p, expected, rtol=5e-2)


def test_interpolator_order1_linear_field_and_gradient():
    pa = _fluid_block()
    xs = np.linspace(0.3, 0.7, 5)
    ys = np.full(5, 0.5)
    interp = Interpolator([pa], x=xs, y=ys, kernel=Gaussian(dim=2),
                          method='order1')
    p = interp.interpolate('p')
    expected = 2.0 * xs + 3.0 * ys
    np.testing.assert_allclose(p, expected, rtol=1e-6)
    # gradient components
    dpdx = interp.interpolate('p', comp=1)
    dpdy = interp.interpolate('p', comp=2)
    np.testing.assert_allclose(dpdx, 2.0, rtol=1e-5)
    np.testing.assert_allclose(dpdy, 3.0, rtol=1e-5)


def test_interpolator_sph_method():
    pa = _fluid_block()
    # set rho to summation density for consistency
    ev = SPHEvaluator([pa], [SummationDensity('fluid', ['fluid'])],
                      dim=2, kernel=CubicSpline(dim=2))
    ev.evaluate()
    xs = np.array([0.5])
    ys = np.array([0.5])
    interp = Interpolator([pa], x=xs, y=ys, kernel=Gaussian(dim=2),
                          method='sph')
    pa.p = 2.0 * pa.x + 3.0 * pa.y
    p = interp.interpolate('p')
    np.testing.assert_allclose(p, [2.5], rtol=5e-2)


def test_density_correction_equations():
    from pysph_tpu.sph.equation import Group
    from pysph_tpu.sph.wc.density_correction import (
        MLSFirstOrder2D, ShepardFilter)
    pa = _fluid_block()
    pa.add_property('rhotmp')
    pa.rho = 1.0 + 0.01 * np.random.RandomState(3).randn(
        pa.get_number_of_particles())
    for cls in (ShepardFilter, MLSFirstOrder2D):
        ev = SPHEvaluator(
            [pa], [Group(equations=[cls('fluid', ['fluid'])],
                         real=False)],
            dim=2, kernel=CubicSpline(dim=2))
        ev.evaluate()
        interior = pa.rho[(pa.x > 0.2) & (pa.x < 0.8) &
                          (pa.y > 0.2) & (pa.y < 0.8)]
        np.testing.assert_allclose(interior, 1.0, rtol=3e-2)
        assert np.all(np.isfinite(pa.rho))


def test_shift_equations_run():
    from pysph_tpu.sph.equation import Group
    from pysph_tpu.sph.wc.shift import (CorrectVelocities, FickianShift,
                                        SimpleShift)
    pa = _fluid_block()
    pa.add_constant('vmax', [0.0])
    pa.add_property('dpos', stride=3)
    pa.add_property('gradv', stride=9)
    x0 = pa.x.copy()
    ev = SPHEvaluator(
        [pa], [Group(equations=[SimpleShift('fluid', ['fluid'])],
                     update_nnps=True),
               Group(equations=[CorrectVelocities('fluid', ['fluid'])])],
        dim=2, kernel=CubicSpline(dim=2))
    ev.evaluate(dt=1e-3)
    assert np.all(np.isfinite(pa.x))
    pa2 = _fluid_block()
    pa2.add_property('dpos', stride=3)
    ev2 = SPHEvaluator(
        [pa2], [Group(equations=[FickianShift('fluid', ['fluid'])])],
        dim=2, kernel=CubicSpline(dim=2))
    ev2.evaluate(dt=1e-3)
    assert np.all(np.isfinite(pa2.x))


def test_gmsh_msh_reader(tmp_path):
    from pysph_tpu.tools.gmsh import msh_file_to_points, read_msh
    msh = """$MeshFormat
2.2 0 8
$EndMeshFormat
$Nodes
4
1 0 0 0
2 1 0 0
3 0 1 0
4 0 0 1
$EndNodes
$Elements
2
1 2 2 0 1 1 2 3
2 4 2 0 1 1 2 3 4
$EndElements
"""
    f = tmp_path / 'box.msh'
    f.write_text(msh)
    pts, cells = read_msh(str(f))
    assert pts.shape == (4, 3)
    assert sorted(t for t, _ in cells) == [2, 4]
    x, y, z = msh_file_to_points(str(f))
    assert x.shape == (6,)  # 4 vertices + 2 centroids


def test_vtk_points_reader(tmp_path):
    from pysph_tpu.tools.gmsh import vtk_file_to_points
    vtk = """# vtk DataFile Version 3.0
points
ASCII
DATASET POLYDATA
POINTS 3 float
0 0 0
1 0 0
0 1 0
"""
    f = tmp_path / 'pts.vtk'
    f.write_text(vtk)
    x, y, z = vtk_file_to_points(str(f))
    assert x.shape == (3,)
    assert x[1] == 1.0


def test_viewer_writes_frames(tmp_path):
    import numpy as np

    from pysph_tpu.base.utils import get_particle_array
    from pysph_tpu.solver.output import dump
    from pysph_tpu.tools.viewer import view, _output_files
    pa = get_particle_array(name='fluid', x=np.arange(10.0),
                            y=np.zeros(10))
    for i in range(2):
        dump(str(tmp_path / ('case_%d.npz' % i)), [pa],
             {'t': 0.1 * i, 'dt': 0.1, 'count': i})
    files = _output_files(str(tmp_path))
    assert len(files) == 2
    view(files, prop='x', save_dir=str(tmp_path / 'frames'),
         show=False)
    import glob
    assert len(glob.glob(str(tmp_path / 'frames' / '*.png'))) == 2


@pytest.mark.slow
def test_html_and_movie_viewers(tmp_path):
    import numpy as np

    from pysph_tpu.base.utils import get_particle_array
    from pysph_tpu.solver.output import dump
    from pysph_tpu.tools.html_viewer import write_html
    from pysph_tpu.tools.viewer import _output_files, write_movie
    pa = get_particle_array(name='fluid', x=np.arange(10.0),
                            y=np.zeros(10), p=np.arange(10.0))
    for i in range(3):
        dump(str(tmp_path / ('case_%d.npz' % i)), [pa],
             {'t': 0.1 * i, 'dt': 0.1, 'count': i})
    files = _output_files(str(tmp_path))
    out = tmp_path / 'view.html'
    write_html(files, str(out), prop='p')
    html = out.read_text()
    assert 'const DATA' in html and '"frames"' in html
    assert html.count('<script>') == 1  # self-contained, no CDN
    movie = tmp_path / 'view.gif'
    write_movie(files, str(movie), prop='p', fps=5)
    assert movie.stat().st_size > 0


def test_ipy_viewer_plot(tmp_path):
    import matplotlib
    matplotlib.use('Agg')
    import numpy as np

    from pysph_tpu.base.utils import get_particle_array
    from pysph_tpu.solver.output import dump
    from pysph_tpu.tools.ipy_viewer import Viewer2D
    pa = get_particle_array(name='fluid', x=np.arange(10.0),
                            y=np.zeros(10), u=np.ones(10))
    dump(str(tmp_path / 'case_0.npz'), [pa],
         {'t': 0.0, 'dt': 0.1, 'count': 0})
    v = Viewer2D(str(tmp_path))
    ax = v.plot(frame=0, prop='vmag', vectors=True)
    assert ax is not None
    assert 'vmag' in v.props


def test_packer_region():
    import numpy as np

    from pysph_tpu.tools.packer import pack_region
    x, y, z = pack_region(0.1, (0, 1, 0, 1), dim=2, n_steps=3)
    assert np.isfinite(x).all()
    assert x.size > 50


def test_native_mesh_fill_cube():
    """Native C++ (or numpy fallback) surface sampling + ray-parity
    fill on a closed unit cube."""
    import numpy as np

    from pysph_tpu.tools.mesh_tools import (
        fill_volume_mesh, surface_points)
    # 12-triangle unit cube
    v = np.array([[x, y, z] for x in (0.0, 1.0) for y in (0.0, 1.0)
                  for z in (0.0, 1.0)])
    quads = [
        (0, 1, 3, 2), (4, 6, 7, 5),   # x- and x+ faces
        (0, 4, 5, 1), (2, 3, 7, 6),   # y- and y+
        (0, 2, 6, 4), (1, 5, 7, 3),   # z- and z+
    ]
    tris = []
    for a, b, c, d in quads:
        tris += [(a, b, c), (a, c, d)]
    tris = np.asarray(tris, np.int64)

    x, y, z = surface_points(v[:, 0], v[:, 1], v[:, 2], tris, 0.25)
    assert x.size > 50
    # sampled points lie on the cube surface
    on = ((np.isclose(x, 0) | np.isclose(x, 1)) |
          (np.isclose(y, 0) | np.isclose(y, 1)) |
          (np.isclose(z, 0) | np.isclose(z, 1)))
    assert on.all()

    fx, fy, fz = fill_volume_mesh(v[:, 0], v[:, 1], v[:, 2], tris,
                                  0.25)
    assert fx.size > 0
    assert (fx >= -1e-9).all() and (fx <= 1 + 1e-9).all()
    assert (fz >= -1e-9).all() and (fz <= 1 + 1e-9).all()
    # the fill covers the interior: ~5^3 lattice points
    assert 60 <= fx.size <= 200


def test_native_lib_builds():
    from pysph_tpu import native
    lib = native.get_lib()
    # the toolchain exists in this image, so the native path should
    # actually be exercised
    assert lib is not None


@pytest.mark.slow
def test_packing_hardpoints_and_projection():
    """Hardpoint pinning + curved-surface projection
    (reference particle_packing.py:989-1074, 1395-1681)."""
    import numpy as np

    from pysph_tpu.tools.particle_packing import (
        ParticlePacking, create_free_particles_rect,
        create_frozen_container_rect)

    dx = 0.1
    bound = (0, 1, 0, 1)
    free = create_free_particles_rect(dx, 1.2, 1000.0, bound, dim=2)
    frozen = create_frozen_container_rect(dx, 1.2, 1000.0, bound,
                                          dim=2)
    # pin two frozen nodes with outward normals
    hp = {0: (np.asarray(frozen.xn)[0], np.asarray(frozen.yn)[0],
              0.0),
          5: (np.asarray(frozen.xn)[5], np.asarray(frozen.yn)[5],
              0.0)}
    s = ParticlePacking([free.name], [], [frozen.name], dim=2,
                        dx=dx, hardpoints=hp)
    s.setup_properties([free, frozen])
    n0 = free.get_number_of_particles()
    s.setup_hardpoints(free, frozen)
    # two pins added; 1-2 nearest free particles removed (they may
    # coincide when both hardpoints share the nearest particle)
    assert n0 <= free.get_number_of_particles() <= n0 + 1
    # the pinned particles sit exactly on the nodes
    fx, fy = np.asarray(free.x), np.asarray(free.y)
    hard = np.asarray(free.hard)
    assert hard.sum() == 2
    for nid in hp:
        d = np.min((fx[hard > 0.5] - np.asarray(frozen.x)[nid]) ** 2 +
                   (fy[hard > 0.5] - np.asarray(frozen.y)[nid]) ** 2)
        assert d < 1e-20

    # relax a few steps: pinned particles must not move
    s.configure_solver(tf=1e9, dt=1e-3)
    solver = s.get_solver()
    solver.setup([free, frozen], s.get_equations(),
                 kernel=solver.kernel)
    solver.set_disable_output(True)
    solver.set_max_steps(5)
    solver.solve(show_progress=False)
    solver._sync_to_host()
    fx2, fy2 = np.asarray(free.x), np.asarray(free.y)
    hard = np.asarray(free.hard)
    for nid in hp:
        d = np.min((fx2[hard > 0.5] - np.asarray(frozen.x)[nid]) ** 2
                   + (fy2[hard > 0.5] -
                      np.asarray(frozen.y)[nid]) ** 2)
        assert d < 1e-20

    # curved-surface projection: snapped particles land on the wall
    # (proj == 0 along the nearest node normal) and are pinned
    n_proj = s.project_to_surface(free, frac=0.2)
    assert n_proj > 0
    assert np.asarray(free.hard).sum() >= 2 + 0  # pins persist
