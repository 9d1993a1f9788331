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


def write_movie(files, out, prop='p', dim=None, fps=10):
    """Render the frames into an animated gif/mp4 (PillowWriter)."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    from matplotlib.animation import FuncAnimation, PillowWriter

    _, arrays = _load(files[0])
    if dim is None:
        zspan = max(float(np.ptp(np.asarray(pa.z)))
                    if pa.get_number_of_particles() else 0.0
                    for pa in arrays.values())
        dim = 3 if zspan > 1e-12 else 2
    fig = plt.figure()
    ax = fig.add_subplot(111, projection='3d' if dim == 3 else None)

    def update(i):
        sd, arrs = _load(files[i])
        _frame(ax, arrs, prop, dim, 'viridis')
        ax.set_title('t = %.5g' % sd.get('t', 0.0))

    anim = FuncAnimation(fig, update, frames=len(files))
    anim.save(out, writer=PillowWriter(fps=fps))
    print('wrote %s (%d frames)' % (out, len(files)))


def watch(path, prop='p', dim=None, interval=2.0):
    """Live-watch a running simulation's output directory: re-scan
    for new dumps every ``interval`` seconds and show the newest
    frame (the analog of the reference Mayavi viewer's live mode)."""
    import time

    import matplotlib
    import matplotlib.pyplot as plt

    headless = not os.environ.get('DISPLAY')
    if headless:
        matplotlib.use('Agg')
    fig = plt.figure()
    ax = None
    seen = None
    try:
        while True:
            files = _output_files(path)
            if files and files[-1] != seen:
                seen = files[-1]
                sd, arrs = _load(seen)
                if ax is None:
                    if dim is None:
                        zspan = max(
                            float(np.ptp(np.asarray(pa.z)))
                            if pa.get_number_of_particles() else 0.0
                            for pa in arrs.values())
                        dim = 3 if zspan > 1e-12 else 2
                    ax = fig.add_subplot(
                        111, projection='3d' if dim == 3 else None)
                _frame(ax, arrs, prop, dim, 'viridis')
                ax.set_title('t = %.5g  [%s]  (watching)' % (
                    sd.get('t', 0.0), prop))
                if headless:
                    fig.savefig(os.path.join(path, 'live.png'),
                                dpi=120)
                else:
                    plt.pause(0.01)
            time.sleep(interval)
    except KeyboardInterrupt:
        return


def view(files, prop='p', dim=None, save_dir=None, show=True,
         vectors=None):
    """Render the given output files.

    Interactive when ``show`` and a GUI backend is available: left /
    right arrows (or j / k) step through frames.  With ``save_dir``
    every frame is written as a PNG instead.  ``vectors`` overlays a
    quiver of the named vector (e.g. 'u,v')."""
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
        if vectors and dim == 2:
            uname, vname = (vectors.split(',') + ['v'])[:2]
            for pa in arrs.values():
                ax.quiver(np.asarray(pa.x), np.asarray(pa.y),
                          np.asarray(getattr(pa, uname)),
                          np.asarray(getattr(pa, vname)),
                          angles='xy', width=0.002, alpha=0.6)
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
    parser.add_argument('--movie', default=None, metavar='OUT.gif',
                        help='write an animated gif of all frames')
    parser.add_argument('--fps', type=int, default=10)
    parser.add_argument('--vectors', default=None, metavar='U,V',
                        help="overlay a quiver of these properties "
                             "(2D), e.g. 'u,v'")
    parser.add_argument('--watch', action='store_true',
                        help='live-watch the directory of a running '
                             'simulation for new dumps')
    parser.add_argument('--html', default=None, metavar='OUT.html',
                        help='export a standalone interactive WebGL '
                             'viewer (tools/html_viewer)')
    opts = parser.parse_args(args)
    if opts.watch:
        return watch(opts.inputs[0], prop=opts.prop, dim=opts.dim)
    files = []
    for p in opts.inputs:
        files.extend(_output_files(p))
    if not files:
        print('no output files found in %s' % opts.inputs)
        return 1
    if opts.html:
        from pysph_tpu.tools.html_viewer import write_html
        return write_html(files, opts.html, prop=opts.prop)
    if opts.movie:
        return write_movie(files, opts.movie, prop=opts.prop,
                           dim=opts.dim, fps=opts.fps)
    view(files, prop=opts.prop, dim=opts.dim,
         save_dir=opts.save_dir, vectors=opts.vectors)


if __name__ == '__main__':
    main()
