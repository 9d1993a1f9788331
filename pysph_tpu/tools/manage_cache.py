"""Manage the persistent compilation cache (parity with
/root/reference/pysph/tools/manage_cache.py).

The reference manages ~/.pysph/source (generated Cython).  Here the
equivalent artifact is the XLA persistent compilation cache; this tool
shows and clears it."""

import argparse
import os
import shutil
import sys

from pysph_tpu.tools.binder import find_dir_size


def get_cache_dir():
    cache = os.environ.get('JAX_COMPILATION_CACHE_DIR')
    if cache:
        return cache
    return os.path.expanduser('~/.cache/jax')


def show_cache(path):
    if not os.path.isdir(path):
        print('no cache at', path)
        return
    print('cache dir:', path)
    print('size: %.1f MB' % (find_dir_size(path) / 1e6))
    print('entries:', sum(len(f) for _, _, f in os.walk(path)))


def clear_cache(path):
    if os.path.isdir(path):
        shutil.rmtree(path)
        print('removed', path)
    else:
        print('no cache at', path)


def main(argv=None):
    if argv is None:
        argv = sys.argv[1:]
    parser = argparse.ArgumentParser(prog='cache',
                                     description=__doc__)
    parser.add_argument('--clear', action='store_true', default=False,
                        help='remove the compilation cache')
    options = parser.parse_args(argv)
    path = get_cache_dir()
    if options.clear:
        clear_cache(path)
    else:
        show_cache(path)


if __name__ == '__main__':
    main()
