"""Cull a simulation output directory, keeping one in every ``c``
output files (parity with /root/reference/pysph/tools/cull.py)."""

import argparse
import os
import sys

from pysph_tpu.solver.utils import get_files
from pysph_tpu.tools.binder import find_dir_size, find_sim_dirs


def cull(src_path, c):
    """(reference cull.py:15)"""
    src_path = os.path.abspath(src_path)
    sim_paths_list = find_sim_dirs(src_path)
    initial_size = find_dir_size(src_path)
    for path in sim_paths_list:
        files = get_files(path)
        n = len(files)
        del_files = [files[i]
                     for i in set(range(n)) - set(range(0, n, c))]
        for f in del_files:
            os.remove(f)
    final_size = find_dir_size(src_path)
    print('Initial size of the directory was: %d bytes'
          % initial_size)
    print('Final size of the directory is: %d bytes' % final_size)


def main(argv=None):
    if argv is None:
        argv = sys.argv[1:]
    parser = argparse.ArgumentParser(prog='cull',
                                     description=__doc__)
    parser.add_argument('src_path', type=str,
                        help='directory to cull')
    parser.add_argument('-c', '--cull-factor', type=int, default=2,
                        help='keep one in every c files [default=2]')
    options = parser.parse_args(argv)
    cull(options.src_path, options.cull_factor)


if __name__ == '__main__':
    main()
