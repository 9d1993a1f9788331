"""Controller interfaces (parity with
/root/reference/pysph/solver/solver_interfaces.py): command line,
XML-RPC (with CORS for browser dashboards) and multiprocessing
manager."""

import threading
from multiprocessing.managers import BaseManager
from xmlrpc.server import (SimpleXMLRPCRequestHandler,
                           SimpleXMLRPCServer)


def get_authkey_bytes(authkey):
    """(reference solver_interfaces.py:17)"""
    if isinstance(authkey, bytes):
        return authkey
    return authkey.encode('utf-8')


class MultiprocessingInterface(BaseManager):
    """Serve the controller over a multiprocessing connection
    (reference solver_interfaces.py:24)."""

    def __init__(self, address=None, authkey=None, try_next_port=False):
        authkey = get_authkey_bytes(authkey or b'pysph')
        BaseManager.__init__(self, address, authkey)
        self.authkey = authkey
        self.try_next_port = try_next_port
        self.controller = None

    def get_controller(self):
        return self.controller

    def start(self, controller):
        self.controller = controller
        self.register('get_controller', self.get_controller)
        if not self.try_next_port:
            self.get_server().serve_forever()
            return
        host, port = self.address
        while True:
            try:
                BaseManager.__init__(self, (host, port), self.authkey)
                self.register('get_controller', self.get_controller)
                self.get_server().serve_forever()
                break
            except OSError:
                port += 1


class MultiprocessingClient(BaseManager):
    """Client for MultiprocessingInterface
    (reference solver_interfaces.py:59)."""

    def __init__(self, address=None, authkey=None, serializer='pickle',
                 start=True):
        authkey = get_authkey_bytes(authkey or b'pysph')
        BaseManager.__init__(self, address, authkey, serializer)
        if start:
            self.start()

    def start(self, connect=True):
        self.register('get_controller')
        if connect:
            self.connect()
        self.controller = self.get_controller()
        return self.controller


class CrossDomainXMLRPCRequestHandler(SimpleXMLRPCRequestHandler):
    """XML-RPC handler allowing cross-origin requests
    (reference solver_interfaces.py:105)."""

    def do_OPTIONS(self):
        self.send_response(200)
        self.end_headers()

    def end_headers(self):
        self.send_header('Access-Control-Allow-Origin', '*')
        self.send_header('Access-Control-Allow-Headers',
                         'Content-Type')
        SimpleXMLRPCRequestHandler.end_headers(self)


class XMLRPCInterface(SimpleXMLRPCServer):
    """Serve the controller over XML-RPC
    (reference solver_interfaces.py:139)."""

    def __init__(self, addr,
                 requestHandler=CrossDomainXMLRPCRequestHandler,
                 logRequests=False):
        SimpleXMLRPCServer.__init__(self, addr, requestHandler,
                                    allow_none=True,
                                    logRequests=logRequests)

    def start(self, controller):
        self.register_instance(controller, allow_dotted_names=False)
        self.register_introspection_functions()
        self.serve_forever()


class CommandlineInterface(object):
    """Interactive command prompt on stdin
    (reference solver_interfaces.py:160)."""

    def start(self, controller):
        while True:
            try:
                inp = input('pysph[%s]>>> ' %
                            controller.get('count'))
            except EOFError:
                break
            cmd = inp.strip().split()
            if not cmd:
                continue
            try:
                command = cmd[0]
                if command == 'p' or command == 'pause':
                    controller.pause_on_next()
                elif command == 'c' or command == 'cont':
                    controller.cont()
                elif command == 'g' or command == 'get':
                    print(controller.get(cmd[1]))
                elif command == 's' or command == 'set':
                    controller.set(cmd[1], eval(cmd[2]))
                elif command == 'q' or command == 'quit':
                    break
                else:
                    print(getattr(controller, command)(*cmd[1:]))
            except Exception as e:
                print('Invalid command: %s' % e)


def _start_in_thread(interface, controller):
    thr = threading.Thread(target=interface.start, args=(controller,))
    thr.daemon = True
    thr.start()
    return thr
