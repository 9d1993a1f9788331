"""Jupyter-notebook viewer widgets (the analog of the reference
ipywidgets viewer, /root/reference/pysph/tools/ipy_viewer.py):
matplotlib scatter/line plots driven by ipywidgets controls — frame
slider with playback, per-array scalar dropdowns and visibility,
colormap/point-size controls, a vector (quiver) toggle for 2D, and
figure export — plus the reference ``Viewer`` utility surface
(``get_frame``/``show_log``/``show_results``/``show_info``/
``show_all``, ipy_viewer.py:19-155).

Deliberately NOT ported from the reference's 2711 LoC (rationale in
PARITY.md §2.7): the plotly/mayavi backends (matplotlib only here),
per-array masking-factor/opacity/legend-limit micro-widgets, and the
multi-spine 1D overlay machinery — the interactive data paths they
serve (pick frame, pick scalar, scrub, save) are all present.
"""

import glob
import json
import os

import numpy as np

from pysph_tpu.tools.viewer import _load, _output_files


class Viewer(object):
    """Base: output discovery, per-frame cache, run introspection
    (reference ipy_viewer.py:19-155)."""

    dim = 2

    def __init__(self, path, cache=True):
        self.path = path if os.path.isdir(path) else \
            os.path.dirname(path) or '.'
        self.files = _output_files(path)
        if not self.files:
            raise FileNotFoundError('no output files in %r' % path)
        self.cache = cache
        self._cached_frames = {}
        sd, arrays = self.get_frame(0)
        self.names = sorted(arrays)
        std = ['p', 'rho', 'u', 'v', 'w', 'vmag', 'h', 'm', 'au',
               'av', 'dw', 'e', 'cs']
        self.props = [p for p in std
                      if all(hasattr(arrays[n], p) or p == 'vmag'
                             for n in self.names)]

    # -- frame access / run introspection ------------------------------
    def get_frame(self, frame):
        """(solver_data, arrays) of output ``frame``; cached when
        ``cache=True`` (reference ipy_viewer.py:38)."""
        if frame in self._cached_frames:
            return self._cached_frames[frame]
        out = _load(self.files[frame])
        if self.cache:
            self._cached_frames[frame] = out
        return out

    def show_log(self):
        """Print the run's log file (reference ipy_viewer.py:79)."""
        logs = glob.glob(os.path.join(self.path, '*.log'))
        for lf in logs:
            with open(lf) as f:
                print(f.read())
        if not logs:
            print('no log file in %r' % self.path)

    def show_info(self):
        """Print the run's .info JSON (reference ipy_viewer.py:105)."""
        infos = glob.glob(os.path.join(self.path, '*.info'))
        for inf in infos:
            with open(inf) as f:
                print(json.dumps(json.load(f), indent=2))
        if not infos:
            print('no .info file in %r' % self.path)

    def show_results(self):
        """Display post-processing images saved next to the output
        (reference ipy_viewer.py:90)."""
        imgs = sorted(glob.glob(os.path.join(self.path, '*.png')) +
                      glob.glob(os.path.join(self.path, '*.svg')))
        try:
            from IPython.display import Image, display
            for img in imgs:
                display(Image(img))
        except ImportError:
            for img in imgs:
                print(img)
        return imgs

    def show_all(self):
        self.show_log()
        self.show_info()
        self.show_results()

    def _values(self, pa, prop):
        if prop == 'vmag':
            u = np.asarray(getattr(pa, 'u', 0.0 * np.asarray(pa.x)))
            v = np.asarray(getattr(pa, 'v', 0.0 * np.asarray(pa.x)))
            w = np.asarray(getattr(pa, 'w', 0.0 * np.asarray(pa.x)))
            return np.sqrt(u * u + v * v + w * w)
        return np.asarray(getattr(pa, prop))

    def save_figure(self, fname, **plot_kw):
        """Render ``plot(**plot_kw)`` straight to ``fname`` (the
        reference's save-figure button, ipy_viewer.py:1045)."""
        import matplotlib
        matplotlib.use('Agg', force=False)
        import matplotlib.pyplot as plt
        ax = self.plot(**plot_kw)
        ax.figure.savefig(fname, dpi=150, bbox_inches='tight')
        plt.close(ax.figure)
        return fname


class Viewer2D(Viewer):
    """``Viewer2D('case_output/').interactive()`` inside a notebook.

    Also usable non-interactively: ``v.plot(frame=3, prop='vmag')``.
    """

    dim = 2

    def plot(self, frame=0, prop='p', arrays=None, vectors=False,
             ax=None, cmap='viridis', s=4, vector_stride=1):
        import matplotlib.pyplot as plt
        sd, arrs = self.get_frame(frame)
        if ax is None:
            _, ax = plt.subplots(figsize=(7, 5))
        shown = arrays or self.names
        sc = None
        for name in shown:
            pa = arrs[name]
            x = np.asarray(pa.x)
            y = np.asarray(pa.y)
            c = self._values(pa, prop)
            if self.dim == 3:
                z = np.asarray(pa.z)
                sc = ax.scatter(x, y, z, c=c, s=s, cmap=cmap)
            else:
                sc = ax.scatter(x, y, c=c, s=s, cmap=cmap)
                if vectors:
                    st = max(1, int(vector_stride))
                    ax.quiver(x[::st], y[::st],
                              np.asarray(getattr(pa, 'u',
                                                 0 * x))[::st],
                              np.asarray(getattr(pa, 'v',
                                                 0 * x))[::st],
                              angles='xy', width=0.002, alpha=0.5)
        if sc is not None:
            plt.colorbar(sc, ax=ax, label=prop)
        ax.set_aspect('equal', adjustable='datalim')
        ax.set_title('t = %.5g' % sd.get('t', 0.0))
        return ax

    def interactive(self):
        """Build and display the widget UI (requires ipywidgets)."""
        import ipywidgets as widgets
        from IPython.display import display

        frame = widgets.IntSlider(min=0, max=len(self.files) - 1,
                                  description='frame')
        play = widgets.Play(min=0, max=len(self.files) - 1,
                            interval=150)
        widgets.jslink((play, 'value'), (frame, 'value'))
        prop = widgets.Dropdown(options=self.props or ['p'],
                                description='scalar')
        cmap = widgets.Dropdown(
            options=['viridis', 'plasma', 'coolwarm', 'jet', 'gray'],
            description='colormap')
        size = widgets.IntSlider(min=1, max=20, value=4,
                                 description='point size')
        vectors = widgets.Checkbox(value=False,
                                   description='velocity vectors')
        arrays = widgets.SelectMultiple(
            options=self.names, value=tuple(self.names),
            description='arrays')
        save = widgets.Button(description='save figure')
        saved = widgets.Label('')

        def _save(_btn):
            fname = os.path.join(self.path, 'viewer_frame_%04d.png'
                                 % frame.value)
            self.save_figure(fname, frame=frame.value,
                             prop=prop.value, cmap=cmap.value,
                             s=size.value, vectors=vectors.value,
                             arrays=list(arrays.value))
            saved.value = 'saved %s' % fname

        save.on_click(_save)
        out = widgets.interactive_output(
            lambda frame, prop, vectors, arrays, cmap, s: self.plot(
                frame=frame, prop=prop, vectors=vectors,
                arrays=list(arrays), cmap=cmap, s=s),
            dict(frame=frame, prop=prop, vectors=vectors,
                 arrays=arrays, cmap=cmap, s=size))
        ui = widgets.VBox([
            widgets.HBox([play, frame, prop, cmap]),
            widgets.HBox([vectors, size, arrays]),
            widgets.HBox([save, saved])])
        display(ui, out)
        return ui

    # reference method name (ipy_viewer.py:814)
    def interactive_plot(self, config=None):
        return self.interactive()


class Viewer1D(Viewer2D):
    """1D line/scatter viewer (reference Viewer1D,
    ipy_viewer.py:785): x vs the chosen scalar per array."""

    dim = 1

    def plot(self, frame=0, prop='rho', arrays=None, vectors=False,
             ax=None, cmap='viridis', s=6, vector_stride=1):
        import matplotlib.pyplot as plt
        sd, arrs = self.get_frame(frame)
        if ax is None:
            _, ax = plt.subplots(figsize=(7, 4))
        for name in (arrays or self.names):
            pa = arrs[name]
            x = np.asarray(pa.x)
            c = self._values(pa, prop)
            order = np.argsort(x)
            ax.plot(x[order], c[order], '.', ms=max(2, s // 2),
                    label=name)
        ax.set_xlabel('x')
        ax.set_ylabel(prop)
        ax.legend(loc='best', fontsize=8)
        ax.set_title('t = %.5g' % sd.get('t', 0.0))
        return ax


class Viewer3D(Viewer2D):
    """3D scatter variant (matplotlib 3D axes)."""

    dim = 3

    def plot(self, frame=0, prop='p', arrays=None, vectors=False,
             ax=None, cmap='viridis', s=2, vector_stride=1):
        import matplotlib.pyplot as plt
        if ax is None:
            fig = plt.figure(figsize=(7, 6))
            ax = fig.add_subplot(111, projection='3d')
        return Viewer2D.plot(self, frame=frame, prop=prop,
                             arrays=arrays, vectors=False, ax=ax,
                             cmap=cmap, s=s)


def viewer(path):
    """Auto-pick Viewer1D/2D/3D from the data and go interactive."""
    v2 = Viewer2D(path)
    _, arrays = v2.get_frame(0)
    zspan = max(float(np.ptp(np.asarray(pa.z)))
                if pa.get_number_of_particles() else 0.0
                for pa in arrays.values())
    yspan = max(float(np.ptp(np.asarray(pa.y)))
                if pa.get_number_of_particles() else 0.0
                for pa in arrays.values())
    if zspan > 1e-12:
        v = Viewer3D(path)
    elif yspan > 1e-12:
        v = v2
    else:
        v = Viewer1D(path)
    return v.interactive()
