"""List and run the bundled examples (parity with
/root/reference/pysph/examples/run.py; the ``pysph run`` command)."""

import argparse
import ast
import os
import sys

HERE = os.path.dirname(__file__)


def _exec_file(filename):
    ns = {'__name__': '__main__', '__file__': filename}
    co = compile(open(filename, 'rb').read(), filename, 'exec')
    exec(co, ns)


def _extract_full_doc(filename):
    p = ast.parse(open(filename, 'rb').read())
    return ast.get_docstring(p)


def _extract_short_doc(dirname, fname):
    line = open(os.path.join(dirname, fname)).readline()
    return line.replace('"""', '').replace("'''", '').strip()


def _get_module(fname):
    start = fname
    parts = ['pysph_tpu.examples']
    while os.path.dirname(start) != '':
        dirname, start = os.path.split(start)
        parts.append(dirname)
    return '.'.join(parts + [start[:-3]])


def example_info(module, filename):
    print('Information for example: %s' % module)
    print(_extract_full_doc(filename))


def get_all_examples():
    examples = []
    ignore = ('run.py', 'db_geometry.py', 'shocktube_setup.py',
              'riemann_2d_config.py', 'beach_geometry.py')
    for dirpath, dirs, files in os.walk(HERE):
        rel_dir = os.path.relpath(dirpath, HERE)
        if rel_dir == '.':
            rel_dir = ''
        for f in sorted(files):
            if not f.endswith('.py') or f.startswith('_'):
                continue
            if f in ignore:
                continue
            path = os.path.join(rel_dir, f)
            examples.append((_get_module(path),
                             _extract_short_doc(dirpath, f)))
    return examples


def get_path(module):
    parts = module.split('.')[2:]
    return os.path.join(HERE, *parts) + '.py'


def guess_correct_module(example):
    examples = get_all_examples()
    if example.endswith('.py'):
        example = example[:-3]
    example = example.replace('/', '.')
    candidates = [(m, d) for m, d in examples
                  if m.endswith('.' + example) or m == example]
    return candidates


def cat_example(module):
    print(open(get_path(module)).read())


def list_examples(examples):
    for module, doc in examples:
        short = module.replace('pysph_tpu.examples.', '')
        print('%-30s %s' % (short, doc))


def run_command(args):
    examples = get_all_examples()
    parser = argparse.ArgumentParser(
        prog='pysph run', description=__doc__, add_help=False)
    parser.add_argument('-h', '--help', action='store_true',
                        default=False)
    parser.add_argument('-l', '--list', action='store_true',
                        default=False, help='List examples.')
    parser.add_argument('--cat', action='store_true', default=False,
                        help='Print the example source.')
    parser.add_argument('args', type=str, nargs='?',
                        help='example name')
    opts, extra = parser.parse_known_args(args)
    if opts.help and opts.args is None:
        parser.print_help()
        list_examples(examples)
        return
    if opts.list:
        list_examples(examples)
        return
    if opts.args:
        candidates = guess_correct_module(opts.args)
        if not candidates:
            print('no example matching %r; use --list' % opts.args)
            sys.exit(1)
        if len(candidates) > 1:
            print('ambiguous; matches:')
            list_examples(candidates)
            sys.exit(1)
        module, _doc = candidates[0]
        filename = get_path(module)
        if opts.cat:
            cat_example(module)
            return
        print('Running example %s.\n' % module)
        sys.argv = [filename] + (['-h'] if opts.help else []) + extra
        _exec_file(filename)
    else:
        list_examples(examples)


def main(argv=None):
    run_command(sys.argv[1:] if argv is None else argv)


if __name__ == '__main__':
    main()
