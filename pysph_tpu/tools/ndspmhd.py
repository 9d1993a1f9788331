"""Load NDSPMHD dump files as gas-dynamics particle arrays (parity
with /root/reference/pysph/tools/ndspmhd.py)."""

import struct

from pysph_tpu.base.utils import get_particle_array_gasd as gpa
from pysph_tpu.tools.fortranfile import FortranFile


def ndspmhd2pysph(fname, dim=2, read_type=False):
    """(reference ndspmhd.py:9)"""
    f = FortranFile(fname)
    endian = f.ENDIAN

    # the header record packs time, counts and run parameters
    f._read_check()
    t = struct.unpack(endian + '1d', f._read_exactly(8))[0]
    npart = struct.unpack(endian + '1i', f._read_exactly(4))[0]
    nprint = struct.unpack(endian + '1i', f._read_exactly(4))[0]
    gamma = struct.unpack(endian + '1d', f._read_exactly(8))[0]
    hfact = struct.unpack(endian + '1d', f._read_exactly(8))[0]
    ndim = struct.unpack(endian + '1i', f._read_exactly(4))[0]
    f._read_exactly(4)          # ndimV
    nc = struct.unpack(endian + '1i', f._read_exactly(4))[0]
    f._read_exactly(4 * 3)      # ifmt, iboundary(2)
    f._read_exactly(8 * 4)      # xmin/xmax
    f._read_exactly(4)          # record trailer... geometry string
    f._read_check()

    # column records: x, y, (z), vx, vy, (vz), ... as in ndspmhd
    cols = [f.read_reals('f8') for _ in range(nc)]
    f.close()

    # standard 2D ndspmhd column layout
    x = cols[0][:npart]
    y = cols[1][:npart]
    u = cols[2][:npart]
    v = cols[3][:npart]
    w = cols[4][:npart] if dim == 3 else 0.0 * x
    offset = 5 if dim == 3 else 4
    h = cols[offset][:npart]
    rho = cols[offset + 1][:npart]
    e = cols[offset + 2][:npart]
    m = cols[offset + 3][:npart]

    pa = gpa(name='fluid', x=x, y=y, u=u, v=v, w=w, rho=rho, e=e,
             m=m, h=h, h0=h.copy())
    pa.add_constant('gamma', gamma)
    pa.add_constant('hfact', hfact)
    pa.add_constant('t', t)
    return pa
