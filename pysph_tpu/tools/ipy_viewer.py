"""Jupyter-notebook viewer widgets (the analog of the reference
ipywidgets viewer, /root/reference/pysph/tools/ipy_viewer.py):
matplotlib scatter plots driven by ipywidgets controls — frame
slider with playback, scalar dropdown, per-array visibility
checkboxes, and a vector (quiver) toggle for 2D."""

import numpy as np

from pysph_tpu.tools.viewer import _load, _output_files


class Viewer2D(object):
    """``Viewer2D('case_output/').interactive()`` inside a notebook.

    Also usable non-interactively: ``v.plot(frame=3, prop='vmag')``.
    """

    dim = 2

    def __init__(self, path):
        self.files = _output_files(path)
        if not self.files:
            raise FileNotFoundError('no output files in %r' % path)
        sd, arrays = _load(self.files[0])
        self.names = sorted(arrays)
        std = ['p', 'rho', 'u', 'v', 'w', 'vmag', 'h', 'm', 'au',
               'av', 'dw', 'e', 'cs']
        self.props = [p for p in std
                      if all(hasattr(arrays[n], p) or p == 'vmag'
                             for n in self.names)]

    def _values(self, pa, prop):
        if prop == 'vmag':
            u = np.asarray(getattr(pa, 'u', 0.0 * np.asarray(pa.x)))
            v = np.asarray(getattr(pa, 'v', 0.0 * np.asarray(pa.x)))
            w = np.asarray(getattr(pa, 'w', 0.0 * np.asarray(pa.x)))
            return np.sqrt(u * u + v * v + w * w)
        return np.asarray(getattr(pa, prop))

    def plot(self, frame=0, prop='p', arrays=None, vectors=False,
             ax=None, cmap='viridis', s=4):
        import matplotlib.pyplot as plt
        sd, arrs = _load(self.files[frame])
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
                    ax.quiver(x, y,
                              np.asarray(getattr(pa, 'u', 0 * x)),
                              np.asarray(getattr(pa, 'v', 0 * x)),
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
        vectors = widgets.Checkbox(value=False,
                                   description='velocity vectors')
        arrays = widgets.SelectMultiple(
            options=self.names, value=tuple(self.names),
            description='arrays')
        out = widgets.interactive_output(
            lambda frame, prop, vectors, arrays: self.plot(
                frame=frame, prop=prop, vectors=vectors,
                arrays=list(arrays)),
            dict(frame=frame, prop=prop, vectors=vectors,
                 arrays=arrays))
        ui = widgets.VBox([widgets.HBox([play, frame, prop]),
                           widgets.HBox([vectors, arrays])])
        display(ui, out)
        return ui


class Viewer3D(Viewer2D):
    """3D scatter variant (matplotlib 3D axes)."""

    dim = 3

    def plot(self, frame=0, prop='p', arrays=None, vectors=False,
             ax=None, cmap='viridis', s=2):
        import matplotlib.pyplot as plt
        if ax is None:
            fig = plt.figure(figsize=(7, 6))
            ax = fig.add_subplot(111, projection='3d')
        return Viewer2D.plot(self, frame=frame, prop=prop,
                             arrays=arrays, vectors=False, ax=ax,
                             cmap=cmap, s=s)


def viewer(path):
    """Auto-pick Viewer2D/Viewer3D from the data and go interactive."""
    v2 = Viewer2D(path)
    _, arrays = _load(v2.files[0])
    zspan = max(float(np.ptp(np.asarray(pa.z)))
                if pa.get_number_of_particles() else 0.0
                for pa in arrays.values())
    v = Viewer3D(path) if zspan > 1e-12 else v2
    return v.interactive()
