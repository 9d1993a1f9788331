"""Output round-trips, restart/resume, .info read-back, controller and
CLI — the analog of reference ``solver/tests/test_solver_utils.py`` and
``test_application.py`` (VERDICT round-2 item 5)."""

import glob
import json
import os
import shutil
import sys
import tempfile
import threading
import time

import numpy as np
import pytest

from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.solver.output import dump, load


def _make_arrays():
    x = np.linspace(0, 1, 10)
    y = x * 2
    fluid = get_particle_array(name='fluid', x=x, y=y, m=np.ones(10),
                               h=np.ones(10) * 0.1)
    fluid.add_property('A', data=np.arange(30, dtype=float), stride=3)
    fluid.add_constant('c0', 1.5)
    fluid.add_constant('cvec', np.array([1.0, 2.0, 3.0]))
    solid = get_particle_array(name='solid', x=x + 10.0,
                               m=np.ones(10) * 2)
    return [fluid, solid]


class TestOutputRoundTrip(object):
    def _round_trip(self, fmt, tmpdir, **kw):
        particles = _make_arrays()
        solver_data = {'t': 0.125, 'dt': 1e-4, 'count': 17}
        fname = os.path.join(tmpdir, 'test_0.' + fmt)
        dump(fname, particles, solver_data, detailed_output=True, **kw)
        data = load(fname)
        return particles, data

    @pytest.mark.parametrize('fmt', ['npz', 'hdf5'])
    def test_dump_load_round_trip(self, fmt, tmp_path):
        particles, data = self._round_trip(fmt, str(tmp_path))
        sd = data['solver_data']
        assert float(sd['t']) == 0.125
        assert float(sd['dt']) == 1e-4
        assert int(sd['count']) == 17
        assert set(data['arrays']) == {'fluid', 'solid'}
        fluid = data['arrays']['fluid']
        orig = particles[0]
        for prop in orig.properties:
            np.testing.assert_allclose(
                np.asarray(fluid.properties[prop]),
                np.asarray(orig.properties[prop]), rtol=1e-14,
                err_msg=prop)
        # strides survive
        assert fluid.stride['A'] == 3
        assert len(fluid.properties['A']) == 30
        # constants survive (scalar + vector)
        np.testing.assert_allclose(np.asarray(fluid.constants['c0']),
                                   1.5)
        np.testing.assert_allclose(np.asarray(fluid.constants['cvec']),
                                   [1.0, 2.0, 3.0])
        assert fluid.get_number_of_particles() == 10

    @pytest.mark.parametrize('fmt', ['npz', 'hdf5'])
    def test_dump_output_subset(self, fmt, tmp_path):
        particles = _make_arrays()
        particles[0].set_output_arrays(['x', 'm'])
        fname = os.path.join(str(tmp_path), 'sub_0.' + fmt)
        dump(fname, particles, {'t': 0.0, 'dt': 1.0, 'count': 0},
             detailed_output=False)
        data = load(fname)
        fluid = data['arrays']['fluid']
        np.testing.assert_allclose(np.asarray(fluid.properties['x']),
                                   np.asarray(particles[0].x))
        if fmt == 'hdf5':
            # hdf5 records unstored props as empty datasets; the loader
            # must fill them with defaults at the right length
            assert len(fluid.properties['y']) == 10
            np.testing.assert_allclose(
                np.asarray(fluid.properties['y']), 0.0)

    def test_npz_compressed(self, tmp_path):
        particles, data = self._round_trip('npz', str(tmp_path),
                                           compress=True)
        np.testing.assert_allclose(
            np.asarray(data['arrays']['fluid'].properties['x']),
            np.asarray(particles[0].x))

    def test_load_rejects_unknown_format(self, tmp_path):
        with pytest.raises(RuntimeError):
            load(os.path.join(str(tmp_path), 'nope.txt'))
        with pytest.raises(RuntimeError):
            load(os.path.join(str(tmp_path), 'missing.npz'))


def _run_drop(tmpdir, extra, max_steps):
    """Run the tiny elliptical drop for max_steps with outputs on."""
    from pysph_tpu.examples.elliptical_drop import EllipticalDrop
    old_argv = sys.argv
    try:
        sys.argv = ['elliptical_drop']
        app = EllipticalDrop()
        app.run(['--nx', '10', '-d', tmpdir, '-q', '--max-steps',
                 str(max_steps), '--pfreq', '2', '--detailed-output',
                 '--n-damp', '0'] + extra)
    finally:
        sys.argv = old_argv
    return app


class TestRestartAndInfo(object):
    def test_restart_resumes_exactly(self, tmp_path):
        # fixed dt: with adaptive stepping even the reference recomputes
        # the post-restart dt from initial_acceleration (at the
        # corrected end-of-step state, not the mid-step state the
        # continuous run's last eval saw), so exact resume equality is
        # only defined for non-adaptive runs (ref solver.py:458).
        d1 = os.path.join(str(tmp_path), 'full')
        d2 = os.path.join(str(tmp_path), 'resumed')
        app1 = _run_drop(d1, ['--no-adaptive-timestep'], max_steps=4)
        files = sorted(glob.glob(os.path.join(
            d1, 'elliptical_drop_0*.npz')) + glob.glob(os.path.join(
                d1, 'elliptical_drop_0*.hdf5')))
        # dumps at step 0, 2, 4
        counts = [load(f)['solver_data']['count'] for f in files]
        assert [int(c) for c in counts] == [0, 2, 4]

        app2 = _run_drop(d2, ['--restart-file', files[1],
                              '--no-adaptive-timestep'], max_steps=4)
        assert app2.solver.count == 4
        ref = load(files[-1])['arrays']['fluid']
        res = {p.name: p for p in app2.particles}['fluid']
        n = ref.get_number_of_particles()
        for prop in ('x', 'y', 'u', 'v', 'rho', 'p'):
            np.testing.assert_allclose(
                np.asarray(res.properties[prop])[:n],
                np.asarray(ref.properties[prop]), rtol=1e-12,
                atol=1e-12, err_msg=prop)
        del app1

    def test_restart_rescale_dt(self, tmp_path):
        d1 = os.path.join(str(tmp_path), 'full')
        d2 = os.path.join(str(tmp_path), 'resc')
        _run_drop(d1, ['--no-adaptive-timestep'], max_steps=2)
        f = sorted(glob.glob(os.path.join(
            d1, 'elliptical_drop_0*.npz')) + glob.glob(os.path.join(
                d1, 'elliptical_drop_0*.hdf5')))[-1]
        sd = load(f)['solver_data']
        app = _run_drop(
            d2, ['--restart-file', f, '--rescale-dt', '0.5',
                 '--no-adaptive-timestep'], max_steps=3)
        assert app.solver.count == 3
        np.testing.assert_allclose(app.solver.dt,
                                   0.5 * float(sd['dt']), rtol=1e-12)

    def test_info_file_read_back(self, tmp_path):
        d1 = os.path.join(str(tmp_path), 'run')
        app = _run_drop(d1, [], max_steps=2)
        info_file = app.info_filename
        assert os.path.exists(info_file)
        with open(info_file) as fp:
            info = json.load(fp)
        assert info['completed']
        assert info['fname'] == 'elliptical_drop'
        assert os.path.abspath(info['output_dir']) == \
            os.path.abspath(d1)
        # read_info re-loads it (used by --post-process / pysph view)
        app2_info = app.read_info(d1)
        assert app2_info['fname'] == 'elliptical_drop'
        assert len(app.output_files) >= 2


class TestController(object):
    def _make_app_thread(self, tmpdir, port):
        """Run the drop in a thread with the multiproc interface."""
        from pysph_tpu.examples.elliptical_drop import EllipticalDrop
        app = EllipticalDrop()
        err = []

        def _run():
            old = sys.argv
            try:
                sys.argv = ['elliptical_drop']
                app.run(['--nx', '10', '-d', tmpdir, '-q',
                         '--max-steps', '60', '--disable-output',
                         '--multiproc',
                         'testauth@127.0.0.1:%d' % port,
                         '--command-interval', '1'])
            except BaseException as e:  # pragma: no cover
                err.append(e)
            finally:
                sys.argv = old

        th = threading.Thread(target=_run, daemon=True)
        th.start()
        return app, th, err

    def test_multiproc_get_set_pause_cont(self, tmp_path):
        from pysph_tpu.solver.solver_interfaces import \
            MultiprocessingClient
        port = 18811
        app, th, err = self._make_app_thread(str(tmp_path), port)
        client = None
        for _ in range(600):  # wait for the server to come up
            if err:
                raise err[0]
            try:
                client = MultiprocessingClient(
                    address=('127.0.0.1', port),
                    authkey=b'testauth')
                break
            except Exception:
                time.sleep(0.5)
        assert client is not None, 'controller server never came up'
        controller = client.controller
        # blocking getters
        t1 = controller.get('t')
        count = controller.get('count')
        assert count >= 0
        names = controller.get_particle_array_names()
        assert 'fluid' in names
        pa = controller.get_named_particle_array('fluid',
                                                 props=['x', 'u'])
        assert len(pa['x']) > 0
        # pause: the count must stop advancing
        controller.pause_on_next()
        controller.wait()
        c1 = controller.get('count')
        time.sleep(1.0)
        c2 = controller.get('count')
        assert c1 == c2
        # set a property while paused, then continue
        controller.set('tf', 1e-6)   # makes the run end immediately
        controller.cont()
        th.join(timeout=120)
        assert not th.is_alive()
        assert not err
        assert controller is not None and t1 >= 0.0


class TestCLI(object):
    def test_cli_run_example(self, tmp_path):
        """`pysph run elliptical_drop ...` end-to-end (tools/cli.py)."""
        from pysph_tpu.tools import cli
        d = os.path.join(str(tmp_path), 'cli_out')
        old_argv = sys.argv
        try:
            sys.argv = ['pysph']
            cli.main(['run', 'elliptical_drop', '--nx', '10', '-q',
                      '--max-steps', '1', '-d', d])
        finally:
            sys.argv = old_argv
        # the runner executes the example as a script; the run's .info
        # and at least one dump must land in the chosen directory
        assert glob.glob(os.path.join(d, '*.info'))
        assert glob.glob(os.path.join(d, '*_00000.*'))

    def test_cli_lists_examples(self, capsys):
        from pysph_tpu.tools import cli
        try:
            cli.main(['run'])   # no example name -> print the roster
        except SystemExit:
            pass
        out = capsys.readouterr().out
        assert 'elliptical_drop' in out
        assert 'dam_break_3d' in out
