"""The ``pysph`` command-line entry point (parity with
/root/reference/pysph/tools/cli.py)."""

import sys
from argparse import ArgumentParser


def run_examples(args):
    from pysph_tpu.examples.run import main
    main(args)


def output_vtk(args):
    from pysph_tpu.solver.vtk_output import main
    main(args)


def dump_xdmf(args):
    from pysph_tpu.tools.dump_xdmf import main
    main(args)


def run_tests(args):
    from pytest import cmdline
    cmdline.main(args=['--pyargs', 'pysph_tpu'] + list(args))


def make_binder(args):
    from pysph_tpu.tools.binder import main
    main(args)


def cull_files(args):
    from pysph_tpu.tools.cull import main
    main(args)


def manage_cache(args):
    from pysph_tpu.tools.manage_cache import main
    main(args)


def run_viewer(args):
    from pysph_tpu.tools.viewer import main
    main(args)


COMMANDS = {
    'run': (run_examples, 'Run one of the bundled examples.'),
    'dump_vtk': (output_vtk, 'Convert output files to VTK.'),
    'dump_xdmf': (dump_xdmf, 'Write XDMF descriptors for hdf5 '
                             'outputs.'),
    'test': (run_tests, 'Run the test suite.'),
    'binder': (make_binder, 'Prepare a directory of results for '
                            'sharing.'),
    'cull': (cull_files, 'Cull old output files.'),
    'cache': (manage_cache, 'Show/clear the compilation cache.'),
    'view': (run_viewer, 'View outputs (external viewer).'),
}


def main(argv=None):
    if argv is None:
        argv = sys.argv[1:]
    parser = ArgumentParser(prog='pysph', description=__doc__)
    parser.add_argument('command', nargs='?',
                        choices=sorted(COMMANDS),
                        help='subcommand to run')
    opts, extra = parser.parse_known_args(argv)
    if opts.command is None:
        parser.print_help()
        for name in sorted(COMMANDS):
            print('  %-10s %s' % (name, COMMANDS[name][1]))
        return
    COMMANDS[opts.command][0](extra)


if __name__ == '__main__':
    main()
