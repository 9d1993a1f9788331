"""Read Gmsh meshes (and simple legacy VTK files) as point clouds for
SPH initialization, and generate simple extruded geometries as .geo
input for Gmsh (parity with /root/reference/pysph/tools/gmsh.py,
which relies on tvtk + a gmsh binary; this version parses .msh 2.2 /
4.1 ASCII and legacy ASCII VTK directly with no extra
dependencies)."""

import gzip
import os
import subprocess

import numpy as np


# ---------------------------------------------------------------------------
# Mesh readers
# ---------------------------------------------------------------------------
def read_msh(fname):
    """Parse a Gmsh .msh file (ASCII, format 2.2 or 4.x).

    Returns (points, cells) where points is (N, 3) float and cells is
    a list of (element_type, (N_elem, n_nodes) int array) with 0-based
    node indices."""
    with open(fname) as f:
        lines = f.read().splitlines()
    it = iter(range(len(lines)))
    version = None
    points = None
    node_ids = None
    cells = []
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        if line == '$MeshFormat':
            version = float(lines[i + 1].split()[0])
            i += 3
        elif line == '$Nodes':
            if version is not None and version >= 4.0:
                hdr = lines[i + 1].split()
                n_blocks, n_nodes = int(hdr[0]), int(hdr[1])
                pts = np.zeros((n_nodes, 3))
                ids = np.zeros(n_nodes, np.int64)
                j = i + 2
                k = 0
                for _ in range(n_blocks):
                    bh = lines[j].split()
                    nb = int(bh[3])
                    j += 1
                    tag_rows = lines[j:j + nb]
                    coord_rows = lines[j + nb:j + 2 * nb]
                    for t, c in zip(tag_rows, coord_rows):
                        ids[k] = int(t)
                        pts[k] = [float(v) for v in c.split()[:3]]
                        k += 1
                    j += 2 * nb
                points, node_ids = pts, ids
                i = j
            else:
                n_nodes = int(lines[i + 1])
                pts = np.zeros((n_nodes, 3))
                ids = np.zeros(n_nodes, np.int64)
                for k in range(n_nodes):
                    parts = lines[i + 2 + k].split()
                    ids[k] = int(parts[0])
                    pts[k] = [float(v) for v in parts[1:4]]
                points, node_ids = pts, ids
                i += 2 + n_nodes
        elif line == '$Elements':
            id_map = {int(nid): k for k, nid in enumerate(node_ids)}
            if version is not None and version >= 4.0:
                hdr = lines[i + 1].split()
                n_blocks = int(hdr[0])
                j = i + 2
                for _ in range(n_blocks):
                    bh = lines[j].split()
                    etype, nb = int(bh[2]), int(bh[3])
                    j += 1
                    conn = []
                    for r in range(nb):
                        nodes = [id_map[int(v)] for v in
                                 lines[j + r].split()[1:]]
                        conn.append(nodes)
                    cells.append((etype, np.asarray(conn,
                                                    np.int64)))
                    j += nb
                i = j
            else:
                n_el = int(lines[i + 1])
                by_type = {}
                for k in range(n_el):
                    parts = lines[i + 2 + k].split()
                    etype = int(parts[1])
                    n_tags = int(parts[2])
                    nodes = [id_map[int(v)]
                             for v in parts[3 + n_tags:]]
                    by_type.setdefault(etype, []).append(nodes)
                for etype, conn in by_type.items():
                    cells.append((etype, np.asarray(conn, np.int64)))
                i += 2 + n_el
        else:
            i += 1
    if points is None:
        raise ValueError('no $Nodes section in %s' % fname)
    return points, cells


def msh_file_to_points(fname, vertices=True, cell_centers=True):
    """Points for SPH seeding from a .msh file: the mesh vertices
    and/or element centroids (x, y, z arrays)."""
    points, cells = read_msh(fname)
    out = []
    if vertices:
        out.append(points)
    if cell_centers:
        for _etype, conn in cells:
            out.append(points[conn].mean(axis=1))
    pts = np.concatenate(out, axis=0) if out else np.zeros((0, 3))
    return pts[:, 0], pts[:, 1], pts[:, 2]


def _open_maybe_gz(fname):
    if fname.endswith('.gz'):
        return gzip.open(fname, 'rt')
    return open(fname)


def vtk_file_to_points(fname, vertices=True, cell_centers=False):
    """Extract points from a legacy-ASCII VTK file (.vtk / .vtk.gz)
    (reference gmsh.py:73 uses tvtk; this parses the POINTS section
    directly)."""
    with _open_maybe_gz(fname) as f:
        tokens = f.read().split()
    pts = None
    for i, tok in enumerate(tokens):
        if tok.upper() == 'POINTS':
            try:
                n = int(tokens[i + 1])
            except (ValueError, IndexError):
                continue  # e.g. the word 'points' in the title line
            vals = [float(v) for v in tokens[i + 3:i + 3 + 3 * n]]
            pts = np.asarray(vals).reshape(n, 3)
            break
    if pts is None:
        raise ValueError('no POINTS section in %s' % fname)
    return pts[:, 0], pts[:, 1], pts[:, 2]


def transform_points(x, y, z, transform):
    """Apply a 4x4 homogeneous transform to the points."""
    t = np.asarray(transform)
    pts = np.stack([x, y, z, np.ones_like(x)])
    out = t @ pts
    return out[0], out[1], out[2]


# ---------------------------------------------------------------------------
# Simple .geo generation (reference gmsh.py:107-423)
# ---------------------------------------------------------------------------
class Loop(object):
    """A closed 2D loop of line segments built from points, written
    out as gmsh .geo Point/Line/Line Loop entities."""

    def __init__(self, points, mesh_size=0.1):
        self.points = list(points)
        self.mesh_size = mesh_size

    def write(self, fp, idx=1):
        pids = []
        for p in self.points:
            x, y = p[0], p[1]
            z = p[2] if len(p) > 2 else 0.0
            fp.write('Point(%d) = {%g, %g, %g, %g};\n'
                     % (idx, x, y, z, self.mesh_size))
            pids.append(idx)
            idx += 1
        lids = []
        for a, b in zip(pids, pids[1:] + pids[:1]):
            fp.write('Line(%d) = {%d, %d};\n' % (idx, a, b))
            lids.append(idx)
            idx += 1
        fp.write('Line Loop(%d) = {%s};\n'
                 % (idx, ', '.join(str(i) for i in lids)))
        self.loop_id = idx
        return idx + 1


class Surface(object):
    """A plane surface bounded by one or more Loops."""

    def __init__(self, *loops):
        self.loops = loops

    def write(self, fp, idx=1):
        for loop in self.loops:
            idx = loop.write(fp, idx)
        lids = ', '.join(str(loop.loop_id) for loop in self.loops)
        fp.write('Plane Surface(%d) = {%s};\n' % (idx, lids))
        self.surface_id = idx
        return idx + 1


class Extrude(object):
    """Extrude a Surface along a vector."""

    def __init__(self, surface, dx=0.0, dy=0.0, dz=1.0):
        self.surface = surface
        self.vector = (dx, dy, dz)

    def write(self, fp, idx=1):
        idx = self.surface.write(fp, idx)
        fp.write('Extrude {%g, %g, %g} { Surface{%d}; }\n'
                 % (self.vector + (self.surface.surface_id,)))
        return idx + 1


class Gmsh(object):
    """Drive the gmsh binary (when installed) on generated .geo input
    and read back the resulting mesh as points."""

    def __init__(self, binary='gmsh', dim=3):
        self.binary = binary
        self.dim = dim

    def write_geo(self, entities, fname):
        with open(fname, 'w') as fp:
            idx = 1
            for e in entities:
                idx = e.write(fp, idx)

    def generate(self, geo_file, msh_file=None):
        if msh_file is None:
            msh_file = os.path.splitext(geo_file)[0] + '.msh'
        subprocess.check_call(
            [self.binary, '-%d' % self.dim, geo_file, '-o',
             msh_file])
        return msh_file

    def get_points(self, geo_entities, tmpdir=None):
        import tempfile
        tmpdir = tmpdir or tempfile.mkdtemp()
        geo = os.path.join(tmpdir, 'model.geo')
        self.write_geo(geo_entities, geo)
        msh = self.generate(geo)
        return msh_file_to_points(msh)
