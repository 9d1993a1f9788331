"""Helpers to prepare simulation directories for sharing (parity with
/root/reference/pysph/tools/binder.py).  The mybinder-specific Docker
scaffolding of the reference is replaced by plain directory utilities
plus a README generator."""

import os


def find_sim_dirs(path, sim_paths_list=None):
    """All directories under ``path`` that contain simulation output
    (an .npz/.hdf5 file or an .info file)
    (reference binder.py:23)."""
    if sim_paths_list is None:
        sim_paths_list = []
    path = os.path.abspath(path)
    entries = os.listdir(path) if os.path.isdir(path) else []
    if any(e.endswith(('.npz', '.hdf5', '.info')) for e in entries):
        sim_paths_list.append(path)
    else:
        for e in entries:
            full = os.path.join(path, e)
            if os.path.isdir(full):
                find_sim_dirs(full, sim_paths_list)
    return sim_paths_list


def find_dir_size(path):
    """Total size in bytes of everything under ``path``
    (reference binder.py:40)."""
    total = 0
    for dirpath, dirnames, filenames in os.walk(path):
        for f in filenames:
            fp = os.path.join(dirpath, f)
            if os.path.isfile(fp):
                total += os.path.getsize(fp)
    return total


def make_notebook(sim_dir):
    """Write a minimal README describing how to view the outputs."""
    readme = os.path.join(sim_dir, 'README_view.md')
    with open(readme, 'w') as f:
        f.write('# Viewing these outputs\n\n'
                'Load files with '
                '`pysph_tpu.solver.output.load(fname)` or convert '
                'with `pysph dump_vtk <dir>`.\n')
    return readme


def main(argv=None):
    import argparse
    parser = argparse.ArgumentParser(prog='binder',
                                     description=__doc__)
    parser.add_argument('src_path', help='directory to prepare')
    options = parser.parse_args(argv)
    dirs = find_sim_dirs(options.src_path)
    for d in dirs:
        make_notebook(d)
    print('prepared %d simulation directories (%d bytes total)' %
          (len(dirs), find_dir_size(options.src_path)))


if __name__ == '__main__':
    main()
