"""Run an example/test script distributed over virtual devices
(parity with /root/reference/pysph/tools/run_parallel_script.py; the
reference launches mpiexec, here the multi-chip path is a
``jax.sharding.Mesh`` over XLA's virtual CPU devices)."""

import os
import subprocess
import sys
import time


def get_directory(fname):
    return os.path.dirname(os.path.abspath(fname))


def kill_process(process):
    print('KILLING PROCESS ON TIMEOUT')
    process.kill()


def run(filename, args=None, nprocs=2, timeout=300.0, path=None):
    """Run ``filename`` as a subprocess with ``nprocs`` virtual
    devices; returns the exit status."""
    if args is None:
        args = []
    path = path or get_directory(filename)
    env = dict(os.environ)
    env['XLA_FLAGS'] = ('--xla_force_host_platform_device_count=%d'
                        % nprocs)
    env['JAX_PLATFORMS'] = 'cpu'
    cmd = [sys.executable, filename] + args
    process = subprocess.Popen(cmd, cwd=path, env=env)
    start = time.time()
    while process.poll() is None:
        if time.time() - start > timeout:
            kill_process(process)
            return 1
        time.sleep(0.2)
    return process.returncode


def main():
    import argparse
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('script')
    parser.add_argument('-n', '--nprocs', type=int, default=2)
    parser.add_argument('-t', '--timeout', type=float, default=300.0)
    opts, extra = parser.parse_known_args()
    sys.exit(run(opts.script, extra, opts.nprocs, opts.timeout))


if __name__ == '__main__':
    main()
