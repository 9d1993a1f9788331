"""Read surface meshes and convert them to particles (parity with
/root/reference/pysph/tools/read_mesh.py).

The reference reads every format through meshio; meshio is not
available here, so STL (ASCII and binary) is parsed natively and
other formats are used when meshio happens to be installed."""

import struct

import numpy as np

from pysph_tpu.tools.mesh_tools import (remove_repeated_points,
                                        surface_points)


def _read_stl(file_name):
    with open(file_name, 'rb') as f:
        head = f.read(5)
    if head == b'solid':
        try:
            return _read_stl_ascii(file_name)
        except Exception:
            pass
    return _read_stl_binary(file_name)


def _read_stl_ascii(file_name):
    verts = []
    with open(file_name) as f:
        for line in f:
            parts = line.split()
            if parts and parts[0] == 'vertex':
                verts.append([float(v) for v in parts[1:4]])
    verts = np.array(verts).reshape(-1, 3)
    cells = np.arange(verts.shape[0]).reshape(-1, 3)
    return verts, cells


def _read_stl_binary(file_name):
    with open(file_name, 'rb') as f:
        f.read(80)
        (ntri,) = struct.unpack('<I', f.read(4))
        data = np.frombuffer(f.read(ntri * 50), dtype=np.uint8)
    data = data.reshape(ntri, 50)
    tri = data[:, 12:48].copy().view('<f4').reshape(ntri, 3, 3)
    verts = tri.reshape(-1, 3).astype(np.float64)
    cells = np.arange(verts.shape[0]).reshape(-1, 3)
    return verts, cells


class Mesh(object):
    """(reference read_mesh.py:14)"""

    def __init__(self, file_name, file_format=None):
        self.file_name = file_name
        self.file_format = file_format
        self.x = self.y = self.z = None
        self.cells = None

    def read(self):
        name = self.file_name.lower()
        fmt = (self.file_format or '').lower()
        if name.endswith('.stl') or fmt == 'stl':
            verts, cells = _read_stl(self.file_name)
        else:
            try:
                import meshio
            except ImportError:
                raise ImportError(
                    'only STL is supported natively; install meshio '
                    'for %r' % self.file_name)
            m = meshio.read(self.file_name, self.file_format)
            verts = m.points
            cells = np.concatenate([c.data for c in m.cells
                                    if c.type == 'triangle'])
        self.x, self.y, self.z = (verts[:, 0], verts[:, 1],
                                  verts[:, 2])
        self.cells = cells
        return self

    def extract_connectivity_info(self):
        return self.cells

    def extract_coordinates(self):
        return self.x, self.y, self.z


def mesh2points(file_name, dx, file_format=None, uniform=False):
    """Surface mesh -> point cloud at spacing ``dx``
    (reference read_mesh.py:54)."""
    mesh = Mesh(file_name, file_format).read()
    x, y, z = surface_points(mesh.x, mesh.y, mesh.z, mesh.cells, dx)
    return remove_repeated_points(x, y, z, dx)
