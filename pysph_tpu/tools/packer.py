"""High-level particle packing driver (parity with
/root/reference/pysph/tools/packer.py): produce body-fitted, packed
initial particle distributions for a rectangular region or an STL
surface mesh using the SPH-relaxation packing scheme in
``tools/particle_packing.py``."""

import os

import numpy as np


def get_packing_folders(folder, dx):
    """Folder layout for cached packing results, keyed by spacing so
    different resolutions don't mix (reference packer.py:18)."""
    parent = os.path.dirname(os.path.abspath(folder))
    preprocess_folder = os.path.join(parent, 'packing_%.4f' % dx)
    layer_folder = os.path.join(parent, 'layer_%.4f' % dx)
    res_folder = os.path.join(parent, 'preprocess')
    os.makedirs(res_folder, exist_ok=True)
    res_file = os.path.join(res_folder, 'packed_%.4f.npz' % dx)
    return preprocess_folder, layer_folder, res_file


def _relax(free, frozen, dx, dim, n_steps, show_progress=False):
    from pysph_tpu.tools.particle_packing import ParticlePacking
    s = ParticlePacking([free.name], [], [frozen.name], dim=dim,
                        dx=dx)
    s.setup_properties([free, frozen])
    s.configure_solver(tf=1e9, dt=1e-3)
    solver = s.get_solver()
    solver.setup([free, frozen], s.get_equations(),
                 kernel=solver.kernel)
    solver.set_disable_output(True)
    solver.set_max_steps(n_steps)
    solver.solve(show_progress=show_progress)
    solver._sync_to_host()
    return free


def pack_region(dx, bound, dim=2, hdx=1.2, rho=1000.0, inside=None,
                n_steps=200, show_progress=False):
    """Relax a jittered block of particles inside ``bound``
    (xmin, xmax, ymin, ymax[, zmin, zmax]) against a frozen boundary
    container, then optionally keep only points where
    ``inside(x, y, z)`` is True.  Returns (x, y, z)."""
    from pysph_tpu.tools.particle_packing import (
        create_free_particles_rect, create_frozen_container_rect)
    free = create_free_particles_rect(dx, hdx, rho, bound, dim=dim)
    frozen = create_frozen_container_rect(dx, hdx, rho, bound,
                                          dim=dim)
    free = _relax(free, frozen, dx, dim, n_steps, show_progress)
    x = np.asarray(free.x)
    y = np.asarray(free.y)
    z = np.asarray(free.z)
    if inside is not None:
        keep = inside(x, y, z)
        x, y, z = x[keep], y[keep], z[keep]
    return x, y, z


def pack_mesh(stl_file, dx, hdx=1.2, rho=1000.0, n_steps=200,
              cache_file=None, show_progress=False):
    """Pack particles inside the volume bounded by a (closed) STL
    surface: the surface is sampled and voxel-filled
    (tools/mesh_tools.fill_volume) to define the inside region, whose
    bounding box is then relaxed and culled.  Cached to
    ``cache_file`` when given."""
    if cache_file is not None and os.path.exists(cache_file):
        data = np.load(cache_file)
        return data['x'], data['y'], data['z']
    from pysph_tpu.tools.mesh_tools import fill_volume_mesh
    from pysph_tpu.tools.read_mesh import Mesh
    mesh = Mesh(stl_file).read()
    fx, fy, fz = fill_volume_mesh(mesh.x, mesh.y, mesh.z, mesh.cells,
                                  dx)
    bound = (fx.min() - dx, fx.max() + dx, fy.min() - dx,
             fy.max() + dx, fz.min() - dx, fz.max() + dx)
    inside = _nearest_inside(fx, fy, fz, dx)
    x, y, z = pack_region(dx, bound, dim=3, hdx=hdx, rho=rho,
                          inside=inside, n_steps=n_steps,
                          show_progress=show_progress)
    if cache_file is not None:
        os.makedirs(os.path.dirname(cache_file) or '.',
                    exist_ok=True)
        np.savez(cache_file, x=x, y=y, z=z)
    return x, y, z


def _nearest_inside(fx, fy, fz, dx):
    """Inside test via hashing the filled voxels (no scipy)."""
    keys = set(zip(np.round(fx / dx).astype(np.int64),
                   np.round(fy / dx).astype(np.int64),
                   np.round(fz / dx).astype(np.int64)))

    def inside(x, y, z):
        kx = np.round(x / dx).astype(np.int64)
        ky = np.round(y / dx).astype(np.int64)
        kz = np.round(z / dx).astype(np.int64)
        return np.fromiter(((a, b, c) in keys for a, b, c in
                            zip(kx, ky, kz)), bool, len(kx))

    return inside
