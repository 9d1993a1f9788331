"""Convert simulation output files to VTK (parity with
/root/reference/pysph/tools/pysph_to_vtk.py; the conversion itself
lives in solver/vtk_output.py — this module keeps the historical
entry point and a small function API)."""

from pysph_tpu.solver.vtk_output import dump_vtk, main  # noqa: F401


def convert(files, outdir=None, scalars=None):
    """Convert the given output files to VTK next to them (or into
    ``outdir``)."""
    import os

    from pysph_tpu.solver.output import load
    written = []
    for f in files:
        data = load(f)
        base = os.path.splitext(os.path.basename(f))[0]
        out = os.path.join(outdir or os.path.dirname(f), base)
        particles = list(data['arrays'].values())
        dump_vtk(out, particles, scalars=scalars)
        written.append(out)
    return written


if __name__ == '__main__':
    main()
