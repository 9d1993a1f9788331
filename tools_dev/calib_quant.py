"""Calibrate achievable accuracy for the cavity-vs-Ghia and
elliptical-drop semi-axis quantitative gates (run on the chip)."""
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.argv = ['calib']


def run_app(app, argv):
    old = sys.argv
    tmpdir = tempfile.mkdtemp()
    try:
        sys.argv = ['calib']
        app.run(['-d', tmpdir] + argv)
        out = app.post_process(app.info_filename)
    finally:
        sys.argv = old
        shutil.rmtree(tmpdir, ignore_errors=True)
    return app, out


def drop(nx=40):
    from pysph_tpu.examples.elliptical_drop import EllipticalDrop
    app, res = run_app(EllipticalDrop(), ['--nx', str(nx), '-q'])
    print('DROP nx=%d: a_num=%.5f a_exact=%.5f rel=%.4f' %
          (nx, res['a_num'], res['a_exact'],
           abs(res['a_num'] - res['a_exact']) / res['a_exact']),
          flush=True)


def cavity(nx=25, tf=3.0):
    from pysph_tpu.examples.cavity import LidDrivenCavity
    from pysph_tpu.examples.ghia_cavity_data import get_u_vs_y
    app, out = run_app(
        LidDrivenCavity(),
        ['--nx', str(nx), '--re', '100', '--tf', str(tf), '-q',
         '--pfreq', '2000'])
    xc, u_c, v_c = out
    y_g, u_g = get_u_vs_y()[100]
    u_i = np.interp(y_g, xc, u_c)
    rms = float(np.sqrt(np.mean((u_i - u_g) ** 2)))
    print('CAVITY nx=%d tf=%g: u_min=%.4f (ghia -0.2109) '
          'rms=%.4f' % (nx, tf, u_c.min(), rms), flush=True)


if __name__ == '__main__':
    which = sys.argv[1] if len(sys.argv) > 1 else 'both'
    if which in ('both', 'drop'):
        drop()
    if which in ('both', 'cavity'):
        cavity()
