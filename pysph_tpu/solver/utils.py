"""Solver utilities: progress bar, output-file helpers
(parity with /root/reference/pysph/solver/utils.py)."""

import glob
import os
import sys
import time

from pysph_tpu.solver.output import load  # noqa: F401  (re-export)


def get_array_by_name(arrays, name):
    for array in arrays:
        if array.name == name:
            return array
    return None


def get_files(dirname=None, fname=None, endswith=('hdf5', 'npz')):
    """Files in the output dir sorted by iteration count."""
    if dirname is None:
        return []
    if fname is None:
        fname = os.path.basename(dirname).rsplit('_output', 1)[0]
    files = []
    for ext in endswith:
        files.extend(glob.glob(os.path.join(
            dirname, fname + '_?*.' + ext)))

    def _key(f):
        try:
            return int(os.path.splitext(os.path.basename(f))[0]
                       .rsplit('_', 1)[1])
        except ValueError:
            return -1
    return sorted(files, key=_key)


def load_and_concatenate(prefix, nprocs=1, directory='.', count=None):
    raise NotImplementedError('per-rank output is not used on TPU')


def mkdir(path):
    if path and not os.path.isdir(path):
        os.makedirs(path, exist_ok=True)


class ProgressBar(object):
    """Minimal terminal progress bar with ETA
    (cf. reference solver/utils.py:125)."""

    def __init__(self, ti, tf, show=True, file=None, ascii=False):
        self.ti = ti
        self.tf = tf
        self.t = ti
        self.show = show
        self.file = file or sys.stdout
        self.start = time.time()
        self.count = 0

    def update(self, t, delta=1):
        self.t = t
        self.count += delta
        if not self.show:
            return
        frac = (self.t - self.ti) / (self.tf - self.ti) if \
            self.tf > self.ti else 1.0
        frac = min(max(frac, 0.0), 1.0)
        elapsed = time.time() - self.start
        eta = elapsed * (1.0 - frac) / frac if frac > 1e-9 else 0.0
        bar = '#' * int(frac * 20)
        self.file.write(
            '\r%4.1f%%|%-20s| T=%.4g ETA: %s' %
            (frac * 100, bar, self.t, self._fmt(eta)))
        self.file.flush()

    @staticmethod
    def _fmt(seconds):
        m, s = divmod(int(seconds), 60)
        h, m = divmod(m, 60)
        if h:
            return '%dh%02dm' % (h, m)
        return '%02dm%02ds' % (m, s)

    def finish(self):
        if self.show:
            self.update(self.tf, 0)
            self.file.write('\n')


def dump_v2(*args, **kw):  # pragma: no cover
    from pysph_tpu.solver.output import dump
    return dump(*args, **kw)


def iter_output(files, *arrays):
    """Iterate over output files yielding (solver_data, *arrays)
    (reference solver/utils.py:196)."""
    from pysph_tpu.solver.output import load
    for f in files:
        data = load(f)
        solver_data = data['solver_data']
        if not arrays:
            yield solver_data, data['arrays']
        else:
            wanted = [data['arrays'][name] for name in arrays]
            yield tuple([solver_data] + wanted)
