"""The Application: user-facing driver for a simulation.

Mirrors the essential surface of
/root/reference/pysph/solver/application.py:52: user subclasses override
``initialize``, ``create_particles``, ``create_scheme``,
``create_equations``, ``create_solver``, ``create_domain``,
``create_nnps``, ``create_tools``, ``add_user_options``,
``consume_user_options``, ``configure_scheme``, ``post_process`` and call
``run()``.  Command-line flags configure time stepping, output, dtype and
capacity knobs.
"""

import argparse
import json
import logging
import os
import socket
import sys
import time

import numpy as np

from pysph_tpu import config as tpu_config
from pysph_tpu.base.cell_grid import GridSpec
from pysph_tpu.solver.tools import Tool
from pysph_tpu.solver.utils import mkdir

logger = logging.getLogger(__name__)


class Application(object):
    def __init__(self, fname=None, output_dir=None, domain=None):
        self.domain = domain
        self.solver = None
        self.nnps = None
        self.scheme = None
        self.tools = []
        self.parallel_manager = None
        self.particles = []
        if fname is None:
            fname = self._guess_fname()
        self.fname = fname
        self.args = sys.argv[1:]
        self.output_dir = output_dir or (fname + '_output')
        self._solve_time = 0.0
        self._setup_time = 0.0
        self.initialize()

    def _guess_fname(self):
        import inspect
        module = self.__class__.__module__
        if module != '__main__':
            return module.rsplit('.', 1)[-1]
        main = sys.modules.get('__main__')
        f = getattr(main, '__file__', None)
        if f:
            return os.path.splitext(os.path.basename(f))[0]
        return self.__class__.__name__.lower()

    # ------------------------------------------------------------------
    # CLI (subset of reference application.py:244-753)
    # ------------------------------------------------------------------
    def _setup_argparse(self):
        parser = argparse.ArgumentParser(
            description=self.__doc__ or '',
            formatter_class=argparse.ArgumentDefaultsHelpFormatter)
        parser.add_argument('-v', '--verbose', action='store_true',
                            dest='verbose', default=False)
        parser.add_argument('-q', '--quiet', action='store_true',
                            dest='quiet', default=False)
        parser.add_argument('--logfile', action='store', dest='logfile',
                            default=None)
        parser.add_argument('-d', '--directory', action='store',
                            dest='output_dir', default=self.output_dir,
                            help='Output directory.')
        parser.add_argument('--max-steps', action='store', type=int,
                            dest='max_steps', default=1 << 31,
                            help='Maximum number of steps to run.')
        parser.add_argument('--disable-output', action='store_true',
                            dest='disable_output', default=False)
        parser.add_argument('--detailed-output', action='store_true',
                            dest='detailed_output', default=False)
        parser.add_argument('--pfreq', '--print-freq', action='store',
                            type=int, dest='freq', default=None,
                            help='Printing frequency for output.')
        parser.add_argument('--reorder-freq', action='store', type=int,
                            dest='reorder_freq', default=None)
        parser.add_argument('--timestep', '--dt', action='store',
                            type=float, dest='time_step', default=None)
        parser.add_argument('--tf', '--final-time', action='store',
                            type=float, dest='final_time', default=None)
        parser.add_argument('--adaptive-timestep', action='store_true',
                            dest='adaptive_timestep', default=None)
        parser.add_argument('--no-adaptive-timestep', action='store_false',
                            dest='adaptive_timestep', default=None)
        parser.add_argument('--cfl', '--cfl-factor', action='store',
                            type=float, dest='cfl', default=0.3)
        parser.add_argument('--n-damp', action='store', type=int,
                            dest='n_damp', default=None)
        parser.add_argument('--use-double', action='store_true',
                            dest='use_double', default=False,
                            help='Use float64 (default float32).')
        parser.add_argument('--restart-file', action='store',
                            dest='restart_file', default=None)
        parser.add_argument('--rescale-dt', action='store', type=float,
                            dest='rescale_dt', default=1.0)
        parser.add_argument('--max-nbrs', action='store', type=int,
                            dest='max_nbrs', default=None,
                            help='Static neighbor-list width K.')
        parser.add_argument('--cell-capacity', action='store', type=int,
                            dest='cell_capacity', default=None)
        parser.add_argument('--post-process', action='store',
                            dest='post_process', default=None, nargs='?',
                            const='.',
                            help='Only perform post-processing.')
        parser.add_argument('-o', '--fname', action='store',
                            dest='fname', default=None,
                            help='Output file base name.')
        parser.add_argument('-z', '--compress-output',
                            action='store_true',
                            dest='compress_output', default=False,
                            help='Compress the output files.')
        parser.add_argument('-l', '--print-log', action='store_true',
                            dest='print_log', default=False,
                            help='Echo log messages to stderr (the '
                                 'default unless -q; kept for CLI '
                                 'parity, reference application.py:283).')
        parser.add_argument('--output-dump-remote', action='store_true',
                            dest='output_dump_remote', default=False,
                            help='Include non-local (halo/ghost) '
                                 'particles in output dumps '
                                 '(reference application.py:407).')
        parser.add_argument('--fixed-h', action='store_true',
                            dest='fixed_h', default=False,
                            help='Smoothing lengths are constant: '
                                 'skip per-step hmax reductions '
                                 '(reference application.py:562).')
        parser.add_argument('--sort-gids', action='store_true',
                            dest='sort_gids', default=False,
                            help='Accepted for parity (reference '
                                 'application.py:576): results are '
                                 'already deterministic here — the '
                                 'pair gather order is fixed by the '
                                 'grid, independent of process count.')
        parser.add_argument('--ghost-layers', action='store', type=int,
                            dest='ghost_layers', default=None,
                            help='Periodic/mirror ghost layer depth '
                                 '(reference application.py:642).')
        parser.add_argument('--output-at-times', action='store',
                            dest='output_at_times', default=None,
                            help='Comma-separated times to dump at.')
        parser.add_argument('--kernel', action='store', dest='kernel',
                            default=None,
                            choices=[
                                'CubicSpline', 'Gaussian',
                                'QuinticSpline', 'SuperGaussian',
                                'WendlandQuintic', 'WendlandQuinticC2_1D',
                                'WendlandQuinticC4', 'WendlandQuinticC4_1D',
                                'WendlandQuinticC6', 'WendlandQuinticC6_1D',
                            ],
                            help='SPH kernel to use.')
        parser.add_argument('--nnps', action='store', dest='nnps',
                            default='grid',
                            choices=['grid', 'll', 'box', 'sh', 'ci',
                                     'strat_hash', 'strat_sfc', 'octree',
                                     'comp_octree'],
                            help='Neighbor search strategy (every choice '
                                 'maps to the dense TPU cell grid; '
                                 'accepted for CLI compatibility).')
        parser.add_argument('--command-interval', action='store',
                            type=int, dest='command_interval', default=1,
                            help='Command-handler polling interval.')
        parser.add_argument('-i', '--interactive', action='store_true',
                            dest='interactive', default=False,
                            help='Interactive commandline control '
                                 'interface (reference '
                                 'application.py:699).')
        parser.add_argument('--xml-rpc', action='store', dest='xml_rpc',
                            default=None, metavar='HOST:PORT',
                            help='Serve an XML-RPC control interface.')
        parser.add_argument('--multiproc', action='store',
                            dest='multiproc', default=None,
                            metavar='AUTHKEY@HOST:PORT',
                            help='Serve a multiprocessing control '
                                 'interface.')
        parser.add_argument('--profile', action='store_true',
                            dest='profile', default=False,
                            help='Print step timing statistics at exit.')

        scheme = self.scheme
        if scheme is not None:
            group = parser.add_argument_group(
                'Scheme options', conflict_handler='resolve')
            scheme.add_user_options(group)
        user = parser.add_argument_group('Application options')
        self.add_user_options(user)
        return parser

    def _process_command_line(self, argv):
        parser = self._setup_argparse()
        self.options = parser.parse_args(argv)
        self.output_dir = self.options.output_dir
        if self.options.use_double:
            tpu_config.use_double(True)

    def _setup_logging(self):
        options = self.options
        level = (logging.ERROR if options.quiet else
                 logging.DEBUG if options.verbose else logging.INFO)
        mkdir(self.output_dir)
        logfile = options.logfile or os.path.join(
            self.output_dir, self.fname + '.log')
        logging.basicConfig(level=level, filename=logfile, filemode='a')
        if not options.quiet:
            logging.getLogger().addHandler(
                logging.StreamHandler(sys.stderr))

    # ------------------------------------------------------------------
    # User-overridable protocol (reference application.py:1486-1760)
    # ------------------------------------------------------------------
    def initialize(self):
        pass

    def create_scheme(self):
        return None

    def create_equations(self):
        if self.scheme is not None:
            return self.scheme.get_equations()
        raise RuntimeError('Application.create_equations: override this '
                           'or provide a scheme.')

    def create_particles(self):
        raise RuntimeError('Application.create_particles: override this.')

    def create_domain(self):
        return self.domain

    def create_inlet_outlet(self, particle_arrays):
        return None

    def create_nnps(self):
        return None

    def create_solver(self):
        if self.scheme is not None:
            return self.scheme.get_solver()
        raise RuntimeError('Application.create_solver: override this or '
                           'provide a scheme.')

    def create_tools(self):
        return []

    def add_user_options(self, group):
        pass

    def consume_user_options(self):
        pass

    def configure_scheme(self):
        pass

    def customize_output(self):
        pass

    def pre_step(self, solver):
        pass

    def post_stage(self, current_time, dt, stage):
        pass

    def post_step(self, solver):
        pass

    def post_process(self, info_fname_or_directory):
        if len(self.output_files) == 0 and len(self.particles) == 0:
            logger.info('Nothing to post-process!')
            return

    # ------------------------------------------------------------------
    # Info file helpers (reference application.py:1387-1495)
    # ------------------------------------------------------------------
    @property
    def info_filename(self):
        return os.path.join(self.output_dir, self.fname + '.info')

    @property
    def output_files(self):
        from pysph_tpu.solver.utils import get_files
        return get_files(self.output_dir, self.fname)

    def read_info(self, fname_or_dir):
        if os.path.isdir(fname_or_dir):
            fname_or_dir = os.path.join(fname_or_dir,
                                        self.fname + '.info')
        self.output_dir = os.path.dirname(fname_or_dir) or '.'
        with open(fname_or_dir) as f:
            info = json.load(f)
        self.output_dir = info.get('output_dir', self.output_dir)
        return info

    def _write_info(self, filename, **kw):
        info = dict(
            fname=self.fname, output_dir=self.output_dir, args=self.args,
            hostname=socket.gethostname(),
            completed=kw.pop('completed', False),
            cpu_time=kw.pop('cpu_time', None),
        )
        info.update(kw)
        with open(filename, 'w') as f:
            json.dump(info, f)

    # ------------------------------------------------------------------
    # Setup + run (reference application.py:1525-1620)
    # ------------------------------------------------------------------
    def setup(self, argv=None):
        if argv is None:
            argv = self.args
        start = time.time()
        self.scheme = self.create_scheme()
        self._process_command_line(argv)
        self._setup_logging()

        if self.scheme is not None:
            self.scheme.consume_user_options(self.options)
        self.consume_user_options()
        self.configure_scheme()

        self.solver = self.create_solver()
        if self.solver is None:
            raise RuntimeError('create_solver returned None')
        self.equations = self.create_equations()

        self.particles = self.create_particles()
        if isinstance(self.particles, tuple):
            self.particles = list(self.particles)
        if self.scheme is not None:
            # non-destructive: examples may add extra properties in
            # create_particles (the reference application never calls
            # setup_properties at all; this is a convenience for
            # examples that skip it)
            self.scheme.setup_properties(self.particles, clean=False)

        # inlet/outlet recycling hooks (reference application.py:842).
        # The reference updates between integrator stages; the whole
        # step is one jitted function here, so the recycle runs on the
        # host after each step (one-stage lag) and the device state is
        # re-synced.  Capacities are 128-padded, so shapes (and jits)
        # survive small count changes.
        particle_dict = dict((p.name, p) for p in self.particles)
        self.inlet_outlet = self.create_inlet_outlet(particle_dict)
        if self.inlet_outlet:
            def _io_update(solver):
                solver._sync_to_host()
                for obj in self.inlet_outlet:
                    for stage in (1, 2):
                        obj.update(solver.t, solver.dt, stage)
                solver._sync_to_device()
                solver._nnps_carry = None
            self.solver.add_post_step_callback(_io_update)

        # restart
        if self.options.restart_file is not None:
            from pysph_tpu.solver.output import load
            data = load(self.options.restart_file)
            sd = data['solver_data']
            arrays = data['arrays']
            for pa in self.particles:
                if pa.name in arrays:
                    src = arrays[pa.name]
                    for prop, arr in src.properties.items():
                        if prop in pa.properties and \
                                arr.size == pa.properties[prop].size:
                            pa.properties[prop][:] = arr
            self.solver.t = float(sd['t'])
            self.solver.dt = float(sd['dt']) * self.options.rescale_dt
            self.solver.count = int(sd['count'])

        self.domain = self.create_domain()
        if self.domain is not None:
            self.solver.set_domain(self.domain)
        self.nnps = self.create_nnps()
        if self.nnps is None:
            kernel = self.solver.kernel
            self.nnps = GridSpec.from_particles(
                self.particles, dim=self.solver.dim,
                radius_scale=kernel.radius_scale, domain=self.domain,
                cell_capacity=self.options.cell_capacity)

        options = self.options
        solver = self.solver
        solver.set_output_directory(self.output_dir)
        solver.set_output_fname(self.fname)
        if options.freq is not None:
            solver.set_print_freq(options.freq)
        if options.detailed_output:
            solver.set_detailed_output(True)
        if options.disable_output:
            solver.set_disable_output(True)
        if options.time_step is not None:
            solver.set_time_step(options.time_step)
        if options.final_time is not None:
            solver.set_final_time(options.final_time)
        if options.adaptive_timestep is not None:
            solver.set_adaptive_timestep(options.adaptive_timestep)
            solver.set_cfl(options.cfl)
        if options.n_damp is not None:
            solver.set_n_damp(options.n_damp)
        solver.set_max_steps(options.max_steps)
        if getattr(options, 'fname', None):
            self.fname = options.fname
            solver.set_output_fname(options.fname)
        if getattr(options, 'compress_output', False):
            solver.set_compress_output(True)
        if getattr(options, 'output_dump_remote', False):
            solver.set_output_only_real(False)
        if getattr(options, 'fixed_h', False):
            solver.fixed_h = True
        if getattr(options, 'ghost_layers', None) is not None and \
                self.domain is not None:
            self.domain.n_layers = float(options.ghost_layers)
        if getattr(options, 'output_at_times', None):
            times = [float(t) for t in
                     str(options.output_at_times).split(',') if t]
            solver.set_output_at_times(times)
        if getattr(options, 'kernel', None):
            import pysph_tpu.base.kernels as _kern
            solver.kernel = getattr(_kern, options.kernel)(
                dim=self.solver.dim)
            self.nnps = self.create_nnps() or GridSpec.from_particles(
                self.particles, dim=self.solver.dim,
                radius_scale=solver.kernel.radius_scale,
                domain=self.domain,
                cell_capacity=self.options.cell_capacity)

        solver.setup(self.particles, self.equations, self.nnps,
                     solver.kernel)

        # remote-control interfaces (reference application.py:1100)
        if getattr(options, 'xml_rpc', None) or \
                getattr(options, 'multiproc', None) or \
                getattr(options, 'interactive', False):
            from pysph_tpu.solver.controller import CommandManager
            from pysph_tpu.solver import solver_interfaces as si
            cm = CommandManager(solver)
            solver.set_command_handler(cm.execute_commands,
                                       options.command_interval)
            if getattr(options, 'interactive', False):
                iface = si.CommandlineInterface()
                cm.add_interface(iface.start)
            if options.xml_rpc:
                host, _, port = options.xml_rpc.partition(':')
                iface = si.XMLRPCInterface((host or 'localhost',
                                            int(port or 8900)))
                cm.add_interface(iface.start)
            if options.multiproc:
                spec = options.multiproc
                authkey, _, addr = spec.rpartition('@')
                host, _, port = addr.partition(':')
                iface = si.MultiprocessingInterface(
                    (host or 'localhost', int(port or 8800)),
                    authkey=(authkey or 'pysph').encode())
                cm.add_interface(iface.start)

        # wire app callbacks
        if type(self).pre_step != Application.pre_step:
            solver.add_pre_step_callback(self.pre_step)
        if type(self).post_step != Application.post_step:
            solver.add_post_step_callback(self.post_step)
        if type(self).post_stage != Application.post_stage:
            solver.add_post_stage_callback(self.post_stage)

        self.tools = list(self.create_tools())
        for tool in self.tools:
            if type(tool).pre_step is not Tool.pre_step:
                solver.add_pre_step_callback(tool.pre_step)
            if type(tool).post_step is not Tool.post_step:
                solver.add_post_step_callback(tool.post_step)
            if type(tool).post_stage is not Tool.post_stage:
                solver.add_post_stage_callback(tool.post_stage)
        self.customize_output()
        self._setup_time = time.time() - start

    def run(self, argv=None):
        """Parse args, set everything up and solve."""
        if argv is None:
            argv = self.args
        # peek for --post-process without full setup
        if '--post-process' in argv:
            idx = argv.index('--post-process')
            arg = argv[idx + 1] if idx + 1 < len(argv) and \
                not argv[idx + 1].startswith('-') else self.output_dir
            self.post_process(arg)
            return
        self.setup(argv)
        self.solve()

    def solve(self):
        start = time.time()
        for tool in self.tools:
            tool.pre_run(self)
        self._write_info(self.info_filename, completed=False)
        self.solver.solve(show_progress=not self.options.quiet)
        self._solve_time = time.time() - start
        self._write_info(self.info_filename, completed=True,
                         cpu_time=self._solve_time)
        for tool in self.tools:
            tool.post_run(self)
        self._finalize_profile()
        logger.info('Run took %.2f s (setup %.2f s)', self._solve_time,
                    self._setup_time)

    def _finalize_profile(self):
        """Write profile_info.csv (always, like the reference's
        run-end CSV, reference application.py:1398-1409); with
        ``--profile`` additionally measure a per-(stage, group, dest)
        device breakdown and print the table."""
        reg = getattr(self.solver, 'profiler', None)
        if reg is None:
            return
        if getattr(self.options, 'profile', False):
            from pysph_tpu.utils.profile import acceleration_breakdown
            try:
                acceleration_breakdown(self.solver, reg)
            except Exception:
                logger.exception('per-group profile breakdown failed')
            print(reg.report())
        try:
            import os
            reg.to_csv(os.path.join(self.output_dir,
                                    'profile_info.csv'))
        except OSError:
            logger.warning('could not write profile_info.csv')
