"""Load SPHysics PART/IPART files as particle arrays (parity with
/root/reference/pysph/tools/sphysics.py)."""

from os.path import basename

import numpy

from pysph_tpu.base.utils import get_particle_array_wcsph as gpa


def sphysics2pysph(partfile, indat='INDAT', dim=3, vtk=False):
    """(reference sphysics.py:10)"""
    data = numpy.loadtxt(partfile)
    ncols = data.shape[-1]
    if ncols == 9 and dim == 2:
        raise RuntimeError(
            'possibly inconsistent dim and SPHysics part file')
    input_data = numpy.loadtxt(indat)
    partbase = basename(partfile)
    fileno = 0 if partbase.startswith('IPART') else \
        int(partbase.split('_')[-1])

    h = float(input_data[24])
    np_ = int(input_data[25])
    nb = int(input_data[26])

    if dim == 3:
        x, y, z = data[:, 0], data[:, 1], data[:, 2]
        u, v, w = data[:, 3], data[:, 4], data[:, 5]
        rho, p, m = data[:, 6], data[:, 7], data[:, 8]
    else:
        x, z = data[:, 0], data[:, 1]
        u, w = data[:, 2], data[:, 3]
        rho, p, m = data[:, 4], data[:, 5], data[:, 6]
        y = numpy.zeros_like(x)
        v = numpy.zeros_like(u)

    hs = numpy.full_like(x, h)
    boundary = gpa(name='boundary', x=x[:nb], y=y[:nb], z=z[:nb],
                   u=u[:nb], v=v[:nb], w=w[:nb], rho=rho[:nb],
                   p=p[:nb], m=m[:nb], h=hs[:nb])
    fluid = gpa(name='fluid', x=x[nb:np_], y=y[nb:np_], z=z[nb:np_],
                u=u[nb:np_], v=v[nb:np_], w=w[nb:np_],
                rho=rho[nb:np_], p=p[nb:np_], m=m[nb:np_],
                h=hs[nb:np_])
    if vtk:
        from pysph_tpu.solver.vtk_output import dump_vtk
        dump_vtk('sphysics_%05d' % fileno, [fluid, boundary])
    return [fluid, boundary]
