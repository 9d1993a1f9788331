"""Solver remote control (parity with
/root/reference/pysph/solver/controller.py).

``CommandManager`` is polled by the Solver between timesteps (wired
through ``Solver.set_command_handler``); ``Controller`` objects are
thread-safe proxies handed to interfaces (command line, XML-RPC,
multiprocessing) to inspect and steer a running simulation.
"""

import logging
import threading

logger = logging.getLogger(__name__)


class DummyComm(object):
    """Serial stand-in for an MPI communicator
    (reference controller.py:14)."""

    def Get_size(self):
        return 1

    def Get_rank(self):
        return 0

    def bcast(self, obj, root=0):
        return obj

    def gather(self, obj, root=0):
        return [obj]

    def recv(self, pid):
        raise NotImplementedError('serial run has no peers')

    def send(self, obj, pid):
        raise NotImplementedError('serial run has no peers')


class _Task(object):
    __slots__ = ('event', 'result')

    def __init__(self):
        self.event = threading.Event()
        self.result = None


class Controller(object):
    """Proxy used by interfaces to control the solver
    (reference controller.py:74).

    ``get``/``set`` and the active methods run immediately (under the
    manager lock); lazy methods are queued and executed between solver
    timesteps — they return a task id whose result is fetched with
    ``get_result``."""

    def __init__(self, command_manager, block=True):
        self.__cm = command_manager
        self.daemon = True
        self.block = block
        for prop in command_manager.solver_props:
            setattr(self, 'get_' + prop, self._getter(prop))
            setattr(self, 'set_' + prop, self._setter(prop))
        for meth in (command_manager.solver_methods |
                     command_manager.lazy_methods |
                     command_manager.active_methods):
            setattr(self, meth, self._dispatcher(meth))

    def _getter(self, prop):
        return lambda: self.__cm.dispatch(self.block, 'get', prop)

    def _setter(self, prop):
        return lambda v: self.__cm.dispatch(self.block, 'set', prop, v)

    def _dispatcher(self, meth):
        return lambda *a, **kw: self.__cm.dispatch(self.block, meth,
                                                   *a, **kw)

    def get(self, name):
        return self.__cm.dispatch(self.block, 'get', name)

    def set(self, name, value):
        return self.__cm.dispatch(self.block, 'set', name, value)

    def get_result(self, task_id):
        return self.__cm.get_result(task_id)

    def get_prop_names(self):
        return sorted(self.__cm.solver_props)

    def pause_on_next(self):
        return self.__cm.pause_on_next()

    def wait(self):
        self.__cm.wait()
        return True

    def cont(self):
        return self.__cm.cont()

    def set_blocking(self, block):
        self.block = block
        return block

    def get_blocking(self):
        return self.block


class CommandManager(object):
    """Queue + synchronize commands from controllers
    (reference controller.py:198)."""

    solver_props = set(('t', 'tf', 'dt', 'count', 'pfreq', 'fname',
                        'detailed_output', 'output_directory',
                        'command_interval'))
    solver_methods = set(('dump_output',))
    lazy_methods = set(('get_particle_array_names',
                        'get_named_particle_array',
                        'get_particle_array_combined',
                        'get_particle_array_from_procs'))
    active_methods = set(('get_status', 'set_log_level'))

    def __init__(self, solver, comm=None):
        self.comm = comm if comm is not None else DummyComm()
        self.rank = self.comm.Get_rank()
        self.solver = solver
        self.interfaces = []
        self.func_dict = {}
        self.rlock = threading.RLock()
        self.plock = threading.Condition()
        self.queue = []
        self.tasks = {}
        self._task_counter = 0
        self.pause = set()

    # -- interface management -----------------------------------------
    def add_interface(self, callable, block=True):
        """Run ``callable(controller)`` in its own daemon thread."""
        control = Controller(self, block)
        thr = threading.Thread(target=callable, args=(control,))
        thr.daemon = True
        thr.start()
        self.interfaces.append(thr)
        return thr

    def add_function(self, callable, interval=1):
        self.func_dict.setdefault(interval, []).append(callable)

    # -- called from the solve loop ------------------------------------
    def execute_commands(self, solver):
        with self.rlock:
            self._run_queued()
        for interval, funcs in self.func_dict.items():
            if solver.count % interval == 0:
                for func in funcs:
                    func(solver)
        # block while paused
        while self.pause:
            with self.plock:
                self.plock.notify_all()
                self.plock.wait(timeout=0.1)
            with self.rlock:
                self._run_queued()

    def _run_queued(self):
        while self.queue:
            task_id, meth, args, kwargs = self.queue.pop(0)
            task = self.tasks[task_id]
            try:
                task.result = self.run_command(meth, args, kwargs)
            finally:
                task.event.set()

    def run_command(self, cmd, args=(), kwargs=None):
        return self.dispatch_dict[cmd](self, *args, **(kwargs or {}))

    # -- dispatch ------------------------------------------------------
    def dispatch(self, block, meth, *args, **kwargs):
        if meth in self.active_methods or meth in ('get', 'set'):
            with self.rlock:
                return self.run_command(meth, args, kwargs)
        # queue for execution between timesteps
        with self.rlock:
            self._task_counter += 1
            task_id = self._task_counter
            self.tasks[task_id] = _Task()
            self.queue.append((task_id, meth, args, kwargs))
        if block:
            return self.get_result(task_id)
        return task_id

    def get_result(self, task_id):
        task = self.tasks[task_id]
        task.event.wait()
        result = task.result
        del self.tasks[int(task_id)]
        return result

    # -- pause / continue ----------------------------------------------
    def pause_on_next(self):
        if self.comm.Get_size() > 1:
            logger.debug('pause not supported in parallel runs')
            return False
        with self.plock:
            self.pause.add(threading.current_thread().ident)
            self.plock.notify()
        return True

    def wait(self):
        with self.plock:
            self.plock.wait()

    def cont(self):
        with self.plock:
            self.pause.discard(threading.current_thread().ident)
            self.plock.notify_all()
        return True

    # -- command implementations ---------------------------------------
    def _get(self, name):
        if name not in self.solver_props:
            raise ValueError('unknown solver property %r' % name)
        return getattr(self.solver, name)

    def _set(self, name, value):
        if name not in self.solver_props:
            raise ValueError('unknown solver property %r' % name)
        setattr(self.solver, name, value)
        return value

    def _dump_output(self):
        self.solver.dump_output()
        return True

    def _get_particle_array_names(self):
        return [pa.name for pa in self.solver.particles]

    def _get_named_particle_array(self, name, props=None):
        self.solver._sync_to_host()
        for pa in self.solver.particles:
            if pa.name == name:
                keep = props or list(pa.output_property_arrays)
                return {p: __import__('numpy').asarray(
                    pa.get(p)) for p in keep}
        raise ValueError('no particle array named %r' % name)

    def _get_particle_array_combined(self):
        return {pa.name: self._get_named_particle_array(pa.name)
                for pa in self.solver.particles}

    def _get_particle_array_from_procs(self, procs=None):
        return [self._get_particle_array_combined()]

    def _get_status(self):
        s = self.solver
        return {'t': s.t, 'tf': s.tf, 'dt': s.dt, 'count': s.count,
                'paused': bool(self.pause)}

    def _set_log_level(self, level):
        logging.getLogger().setLevel(level)
        return level

    dispatch_dict = {
        'get': _get,
        'set': _set,
        'dump_output': _dump_output,
        'get_particle_array_names': _get_particle_array_names,
        'get_named_particle_array': _get_named_particle_array,
        'get_particle_array_combined': _get_particle_array_combined,
        'get_particle_array_from_procs': _get_particle_array_from_procs,
        'get_status': _get_status,
        'set_log_level': _set_log_level,
    }
