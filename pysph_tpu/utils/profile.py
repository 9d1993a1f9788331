"""Profiling: phase timers + per-group device breakdown.

Plays the role of compyle.profile in the reference (SURVEY.md section 5:
``--profile`` prints a table, ``profile_info.csv`` is always written at
run end, generated code carries per-(group, dest, src) labels,
acceleration_eval_cython.mako:14-128).  Under XLA everything inside one
jit fuses, so the equivalents are:

- ``ProfileRegistry``: wall-clock accumulation of the solver's host-side
  phases (dispatch, output, callbacks) — cheap enough to always run.
- ``acceleration_breakdown``: re-jits each acceleration stage with
  growing group prefixes and differences the timings, giving per-group
  device costs (only with ``--profile``; pays one compile per group).
- ``jax.named_scope`` labels around each (group, dest) region (see
  acceleration_eval.py) so an externally captured ``jax.profiler`` trace
  shows reference-style names.
"""

import time

import numpy as np


class ProfileRegistry(object):
    """Named wall-clock accumulators."""

    def __init__(self):
        self.data = {}  # name -> [calls, total]

    def add(self, name, seconds):
        rec = self.data.setdefault(name, [0, 0.0])
        rec[0] += 1
        rec[1] += seconds

    def timer(self, name):
        return _Timer(self, name)

    def rows(self):
        out = []
        for name, (calls, total) in sorted(
                self.data.items(), key=lambda kv: -kv[1][1]):
            out.append((name, calls, total,
                        total / calls if calls else 0.0))
        return out

    def report(self):
        lines = ['%-44s %8s %12s %12s' % ('phase', 'calls',
                                          'total (s)', 'avg (ms)')]
        for name, calls, total, avg in self.rows():
            lines.append('%-44s %8d %12.3f %12.3f'
                         % (name[:44], calls, total, avg * 1e3))
        return '\n'.join(lines)

    def to_csv(self, path):
        with open(path, 'w') as f:
            f.write('function,calls,time,avg_time\n')
            for name, calls, total, avg in self.rows():
                f.write('"%s",%d,%.6f,%.6f\n'
                        % (name, calls, total, avg))


class _Timer(object):
    __slots__ = ('reg', 'name', 't0')

    def __init__(self, reg, name):
        self.reg = reg
        self.name = name

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.reg.add(self.name, time.perf_counter() - self.t0)
        return False


def _barrier(out):
    import jax
    leaves = jax.tree_util.tree_leaves(out)
    if leaves:
        np.asarray(leaves[0].ravel()[:1])


def acceleration_breakdown(solver, registry, repeats=3):
    """Per-(stage, group, dest) device timing by prefix differencing.

    Each acceleration stage is re-jitted with groups[:1], groups[:2],
    ... and the consecutive differences attributed to each group (the
    reference's per-group profile labels,
    acceleration_eval_cython.mako:14)."""
    import jax
    states = solver.states
    t, dt = solver.t, solver.dt
    for si, ae in enumerate(solver.integrator.acceleration_evals):
        with registry.timer('breakdown.prepare[stage%d]' % si):
            handle = jax.jit(lambda s, ae=ae: ae.prepare(s)[0])(states)
            _barrier(handle.origin)
        groups = ae.groups
        prev = 0.0
        for gi in range(len(groups)):
            saved = ae.groups
            ae.groups = groups[:gi + 1]
            try:
                jf = jax.jit(
                    lambda s, ae=ae, h=handle: ae.compute(t, dt, s, h))
                out = jf(states)
                _barrier(out)
                t0 = time.perf_counter()
                for _ in range(repeats):
                    out = jf(states)
                _barrier(out)
                cum = (time.perf_counter() - t0) / repeats
            finally:
                ae.groups = saved
            g = groups[gi]
            dests = sorted({e.dest for e in ae._iter_equations([g])})
            label = getattr(g, 'name', None) or 'Group%d' % gi
            registry.add('stage%d.%s_d_%s' % (si, label,
                                              ','.join(dests)),
                         max(cum - prev, 0.0))
            prev = cum
