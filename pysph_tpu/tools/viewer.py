"""Matplotlib-based output viewer — the ``pysph view`` command
(standing in for the reference Mayavi/ipywidgets viewers,
/root/reference/pysph/tools/mayavi_viewer.py:1432 and
ipy_viewer.py; Mayavi is not available in this environment, so this
renders particle scatters with matplotlib, interactively when a
display exists and as PNG frames otherwise)."""

import glob
import os
from argparse import ArgumentParser

import numpy as np


def _output_files(path):
    if os.path.isfile(path):
        return [path]
    files = []
    for pat in ('*.hdf5', '*.npz'):
        files.extend(glob.glob(os.path.join(path, pat)))
    files = [f for f in files if not f.endswith('results.npz')]

    def key(f):
        base = os.path.splitext(os.path.basename(f))[0]
        tail = base.split('_')[-1]
        return int(tail) if tail.isdigit() else 0

    return sorted(files, key=key)


def _load(fname):
    from pysph_tpu.solver.output import load
    data = load(fname)
    return data['solver_data'], data['arrays']


def _frame(ax, arrays, prop, dim, cmap):
    import matplotlib.pyplot as plt
    ax.clear()
    sc = None
    for name, pa in arrays.items():
        x = np.asarray(pa.x)
        y = np.asarray(pa.y)
        z = np.asarray(getattr(pa, 'z', np.zeros_like(x)))
        c = np.asarray(getattr(pa, prop, np.zeros_like(x)))
        if dim == 3:
            sc = ax.scatter(x, y, z, c=c, s=2, cmap=cmap)
        else:
            sc = ax.scatter(x, y, c=c, s=2, cmap=cmap)
    ax.set_aspect('equal', adjustable='datalim')
    return sc


def view(files, prop='p', dim=None, save_dir=None, show=True):
    """Render the given output files.

    Interactive when ``show`` and a GUI backend is available: left /
    right arrows (or j / k) step through frames.  With ``save_dir``
    every frame is written as a PNG instead."""
    import matplotlib
    if save_dir is not None or not os.environ.get('DISPLAY'):
        matplotlib.use('Agg')
        show = False
    import matplotlib.pyplot as plt

    solver_data, arrays = _load(files[0])
    if dim is None:
        zspan = max(float(np.ptp(np.asarray(pa.z)))
                    if pa.get_number_of_particles() else 0.0
                    for pa in arrays.values())
        dim = 3 if zspan > 1e-12 else 2

    fig = plt.figure()
    ax = fig.add_subplot(
        111, projection='3d' if dim == 3 else None)

    state = {'i': 0}

    def draw():
        sd, arrs = _load(files[state['i']])
        _frame(ax, arrs, prop, dim, 'viridis')
        ax.set_title('t = %.5g  (%d/%d)  [%s]' % (
            sd.get('t', 0.0), state['i'] + 1, len(files), prop))
        fig.canvas.draw_idle()

    if save_dir is not None:
        os.makedirs(save_dir, exist_ok=True)
        for i in range(len(files)):
            state['i'] = i
            draw()
            out = os.path.join(save_dir, 'frame_%05d.png' % i)
            fig.savefig(out, dpi=120)
        print('wrote %d frames to %s' % (len(files), save_dir))
        return

    def on_key(event):
        if event.key in ('right', 'k'):
            state['i'] = min(state['i'] + 1, len(files) - 1)
        elif event.key in ('left', 'j'):
            state['i'] = max(state['i'] - 1, 0)
        else:
            return
        draw()

    fig.canvas.mpl_connect('key_press_event', on_key)
    draw()
    if show:
        plt.show()
    return fig


def main(args=None):
    parser = ArgumentParser(
        prog='pysph view', description=__doc__)
    parser.add_argument('inputs', nargs='+',
                        help='output directories or files')
    parser.add_argument('--prop', default='p',
                        help='property to color by (default: p)')
    parser.add_argument('--dim', type=int, default=None,
                        choices=(2, 3))
    parser.add_argument('--save-images', dest='save_dir',
                        default=None, metavar='DIR',
                        help='write PNG frames instead of showing a '
                             'window')
    opts = parser.parse_args(args)
    files = []
    for p in opts.inputs:
        files.extend(_output_files(p))
    if not files:
        print('no output files found in %s' % opts.inputs)
        return 1
    view(files, prop=opts.prop, dim=opts.dim,
         save_dir=opts.save_dir)


if __name__ == '__main__':
    main()
