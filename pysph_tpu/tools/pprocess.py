"""Post-processing helpers (parity with
/root/reference/pysph/tools/pprocess.py).  VTK snapshots use the
dependency-free legacy writer in ``solver/vtk_output.py``."""

import os

import numpy as np

import pysph_tpu.solver.utils as utils
from pysph_tpu.solver.vtk_output import VTKOutput


def get_ke_history(files, array_name):
    """(reference pprocess.py:17)"""
    t, ke = [], []
    for sd, array in utils.iter_output(files, array_name):
        t.append(float(sd['t']))
        m = np.asarray(array.m)
        u = np.asarray(array.u)
        v = np.asarray(array.v)
        w = np.asarray(array.w)
        ke.append(0.5 * np.sum(m * (u ** 2 + v ** 2 + w ** 2)))
    return np.asarray(t), np.asarray(ke)


class Results(object):
    """(reference pprocess.py:27)"""

    def __init__(self, dirname=None, fname=None,
                 endswith=('npz', 'hdf5')):
        self.dirname = dirname
        self.fname = fname
        self.endswith = endswith
        self.start = 0
        if dirname is not None and fname is not None:
            self.load()

    def set_dirname(self, dirname):
        self.dirname = dirname

    def set_fname(self, fname):
        self.fname = fname

    def load(self):
        self.files = utils.get_files(self.dirname, self.fname,
                                     self.endswith)
        self.nfiles = len(self.files)

    def reload(self):
        self.start = self.nfiles
        self.load()

    def get_ke_history(self, array_name):
        self.t, self.ke = get_ke_history(self.files, array_name)

    def write_vtk(self, array_name, props):
        if not isinstance(props, list):
            props = [props]
        dirname = os.path.join(self.dirname, 'vtk')
        utils.mkdir(dirname)
        from pysph_tpu.solver.output import load
        for i in range(self.start, self.nfiles):
            data = load(self.files[i])
            array = data['arrays'][array_name]
            fileno = data['solver_data']['count']
            arrays = {p: np.asarray(array.get(p)) for p in
                      ('x', 'y', 'z')}
            for prop in props:
                if prop == 'vmag':
                    u = np.asarray(array.u)
                    v = np.asarray(array.v)
                    w = np.asarray(array.w)
                    arrays['vmag'] = np.sqrt(u**2 + v**2 + w**2)
                else:
                    arrays[prop] = np.asarray(array.get(prop))
            out = VTKOutput()
            fname = os.path.join(dirname, '%s_%s_%s' %
                                 (self.fname, array_name, fileno))
            out._dump_arrays(fname, arrays)


class PySPH2VTK(object):
    """Convert particle arrays to ParaView-legible VTK files
    (reference pprocess.py:113)."""

    def __init__(self, arrays, dirname='.', fileno=None):
        self.arrays = arrays
        self.dirname = dirname
        self.fileno = fileno
        self.array_dict = dict((a.name, a) for a in arrays)

    def write_vtk(self, array_name, props):
        if array_name not in self.array_dict:
            raise RuntimeError('array %s not defined' % array_name)
        if not isinstance(props, list):
            props = [props]
        array = self.array_dict[array_name]
        arrays = {p: np.asarray(array.get(p)) for p in
                  ('x', 'y', 'z')}
        for prop in props:
            if prop == 'vmag':
                u = np.asarray(array.u)
                v = np.asarray(array.v)
                w = np.asarray(array.w)
                arrays['vmag'] = np.sqrt(u**2 + v**2 + w**2)
            else:
                arrays[prop] = np.asarray(array.get(prop))
        utils.mkdir(self.dirname)
        suffix = '' if self.fileno is None else '_%s' % self.fileno
        out = VTKOutput()
        out._dump_arrays(os.path.join(
            self.dirname, '%s%s' % (array_name, suffix)), arrays)
