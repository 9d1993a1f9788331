"""Write XDMF descriptors referencing HDF5 particle outputs so
ParaView/VisIt can read them directly (parity with
/root/reference/pysph/tools/dump_xdmf.py)."""

import argparse
import os
import sys

import numpy as np

from pysph_tpu.solver.output import load
from pysph_tpu.solver.utils import get_files

TEMPLATE_HEAD = """<?xml version="1.0" ?>
<!DOCTYPE Xdmf SYSTEM "Xdmf.dtd" []>
<Xdmf Version="2.0">
 <Domain>
"""
TEMPLATE_TAIL = """ </Domain>
</Xdmf>
"""


def _grid_block(name, fname, n, props, t):
    lines = ['  <Grid Name="%s" GridType="Uniform">' % name,
             '   <Time Value="%s"/>' % t,
             '   <Topology TopologyType="Polyvertex" '
             'NumberOfElements="%d"/>' % n,
             '   <Geometry GeometryType="X_Y_Z">']
    for axis in 'xyz':
        lines.append(
            '    <DataItem Dimensions="%d" Format="HDF">'
            '%s:/particles/%s/arrays/%s</DataItem>'
            % (n, fname, name, axis))
    lines.append('   </Geometry>')
    for prop in props:
        lines.append('   <Attribute Name="%s" Center="Node">' % prop)
        lines.append(
            '    <DataItem Dimensions="%d" Format="HDF">'
            '%s:/particles/%s/arrays/%s</DataItem>'
            % (n, fname, name, prop))
        lines.append('   </Attribute>')
    lines.append('  </Grid>')
    return '\n'.join(lines) + '\n'


def dump_xdmf(files, outdir=None, combined=True):
    """Write one .xdmf per .hdf5 output file."""
    written = []
    for f in files:
        if not f.endswith(('.hdf5', '.h5')):
            continue
        data = load(f)
        out = os.path.splitext(f)[0] + '.xdmf'
        if outdir is not None:
            out = os.path.join(outdir,
                               os.path.basename(out))
        t = float(data['solver_data']['t'])
        with open(out, 'w') as fp:
            fp.write(TEMPLATE_HEAD)
            for name, pa in data['arrays'].items():
                n = np.asarray(pa.x).size
                props = [p for p in pa.output_property_arrays
                         if p not in ('x', 'y', 'z')]
                fp.write(_grid_block(name, os.path.basename(f), n,
                                     props, t))
            fp.write(TEMPLATE_TAIL)
        written.append(out)
    return written


def main(argv=None):
    if argv is None:
        argv = sys.argv[1:]
    parser = argparse.ArgumentParser(prog='dump_xdmf',
                                     description=__doc__)
    parser.add_argument('inputfile', nargs='+',
                        help='.hdf5 files or output directories')
    parser.add_argument('-d', '--outdir', default=None)
    options = parser.parse_args(argv)
    import glob
    files = []
    for f in options.inputfile:
        if os.path.isdir(f):
            found = get_files(f, endswith=('hdf5', 'h5'))
            if not found:
                found = sorted(
                    glob.glob(os.path.join(f, '*.hdf5')) +
                    glob.glob(os.path.join(f, '*.h5')))
            files.extend(found)
        else:
            files.append(f)
    written = dump_xdmf(files, outdir=options.outdir)
    print('wrote %d xdmf files' % len(written))


if __name__ == '__main__':
    main()
