"""VTK export of particle outputs (parity with
/root/reference/pysph/solver/vtk_output.py).

The reference depends on pyvisfile or tvtk; neither is available
here, so ``VTKOutput`` writes self-contained legacy ASCII VTK polydata
(readable by ParaView/VisIt) with no external dependencies.  The
pyvisfile/tvtk subclasses delegate to it when their libraries are
absent.
"""

import os

import numpy as np

from pysph_tpu.solver.output import Output, load


class VTKOutput(Output):
    """(reference vtk_output.py:15)"""

    def __init__(self, only_real=True, mpi_comm=None,
                 compress=False):
        super(VTKOutput, self).__init__(only_real=only_real,
                                        mpi_comm=mpi_comm,
                                        compress=compress)

    def _get_scalars(self, arrays):
        names = [k for k, v in arrays.items()
                 if np.ndim(v) == 1 and k not in ('x', 'y', 'z')]
        return [(n, arrays[n]) for n in sorted(names)]

    def _get_vectors(self, arrays):
        vecs = []
        if all(k in arrays for k in 'uvw'):
            vecs.append(('V', np.stack(
                [arrays['u'], arrays['v'], arrays['w']], axis=1)))
        return vecs

    def _dump(self, filename):
        for name, pa in self.all_array_data.items():
            self._dump_arrays('%s_%s' % (filename, name), pa)

    def _dump_arrays(self, filename, arrays):
        x = np.asarray(arrays.get('x', 0.0))
        y = np.asarray(arrays.get('y', np.zeros_like(x)))
        z = np.asarray(arrays.get('z', np.zeros_like(x)))
        n = x.size
        scalars = self._get_scalars(arrays)
        vectors = self._get_vectors(arrays)
        with open(filename + '.vtk', 'w') as f:
            f.write('# vtk DataFile Version 3.0\n')
            f.write('pysph_tpu particle output\n')
            f.write('ASCII\nDATASET POLYDATA\n')
            f.write('POINTS %d float\n' % n)
            np.savetxt(f, np.stack([x, y, z], axis=1), fmt='%.7g')
            f.write('VERTICES %d %d\n' % (n, 2 * n))
            np.savetxt(f, np.stack(
                [np.ones(n, dtype=np.int64),
                 np.arange(n, dtype=np.int64)], axis=1), fmt='%d')
            f.write('POINT_DATA %d\n' % n)
            for pname, data in scalars:
                data = np.asarray(data)
                if data.size != n:
                    continue
                f.write('SCALARS %s float 1\nLOOKUP_TABLE default\n'
                        % pname)
                np.savetxt(f, data, fmt='%.7g')
            for vname, data in vectors:
                f.write('VECTORS %s float\n' % vname)
                np.savetxt(f, data, fmt='%.7g')


class PyVisFileOutput(VTKOutput):
    """(reference vtk_output.py:89) — falls back to the built-in
    legacy writer when pyvisfile is unavailable."""


class TVTKOutput(VTKOutput):
    """(reference vtk_output.py:105) — falls back to the built-in
    legacy writer when tvtk is unavailable."""


def dump_vtk(filename, particles, scalars=None, **vectors):
    """(reference vtk_output.py:123)"""
    output = VTKOutput()
    output.dump(filename, particles, {})


def run(options):
    """(reference vtk_output.py:152)"""
    for fname in options.inputfile:
        if os.path.isdir(fname):
            import glob
            from pysph_tpu.solver.utils import get_files
            files = get_files(fname)
            if not files:
                files = sorted(
                    glob.glob(os.path.join(fname, '*.npz')) +
                    glob.glob(os.path.join(fname, '*.hdf5')))
        else:
            files = [fname]
        for f in files:
            data = load(f)
            particles = list(data['arrays'].values())
            base = os.path.splitext(os.path.basename(f))[0]
            out = os.path.join(options.outdir or '.', base)
            dump_vtk(out, particles)
            print('wrote', out + '_*.vtk')


def main(argv=None):
    """(reference vtk_output.py:172)"""
    import argparse
    parser = argparse.ArgumentParser(
        prog='dump_vtk', description=__doc__)
    parser.add_argument('inputfile', nargs='+',
                        help='.npz/.hdf5 output files or dirs')
    parser.add_argument('-d', '--outdir', default=None,
                        help='output directory')
    options = parser.parse_args(argv)
    run(options)


if __name__ == '__main__':
    main()
