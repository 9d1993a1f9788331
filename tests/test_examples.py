"""Example smoke tests: run every example for a couple of steps
(the analog of reference examples/tests/test_examples.py)."""

import importlib
import os
import shutil
import sys
import tempfile

import numpy as np
import pytest

EXAMPLES = [
    ('pysph_tpu.examples.elliptical_drop', 'EllipticalDrop',
     ['--nx', '20']),
    ('pysph_tpu.examples.taylor_green', 'TaylorGreen', ['--nx', '20']),
    ('pysph_tpu.examples.dam_break_2d', 'DamBreak2D', ['--dx', '0.08']),
    ('pysph_tpu.examples.dam_break_2d', 'DamBreak2D',
     ['--dx', '0.08', '--scheme', 'edac']),
    ('pysph_tpu.examples.dam_break_2d', 'DamBreak2D',
     ['--dx', '0.08', '--scheme', 'iisph']),
    ('pysph_tpu.examples.gas_dynamics.shocktube', 'ShockTube',
     ['--nl', '100', '--scheme', 'mpm']),
    ('pysph_tpu.examples.gas_dynamics.shocktube', 'ShockTube',
     ['--nl', '100', '--scheme', 'adke']),
    ('pysph_tpu.examples.cavity', 'LidDrivenCavity', ['--nx', '12']),
    ('pysph_tpu.examples.couette', 'CouetteFlow', []),
    ('pysph_tpu.examples.hydrostatic_tank', 'HydrostaticTank', []),
    ('pysph_tpu.examples.shallow_water.cylindrical_dambreak', 'CylindricalDamBreak',
     ['--n', '12']),
    ('pysph_tpu.examples.gas_dynamics.sedov', 'SedovPointExplosion',
     ['--nx', '31']),
    ('pysph_tpu.examples.rayleigh_taylor', 'RayleighTaylor', []),
    ('pysph_tpu.examples.two_blocks', 'TwoBlocks', []),
    ('pysph_tpu.examples.elliptical_drop_simple', 'EllipticalDrop',
     []),
    ('pysph_tpu.examples.periodic_cylinders', 'PeriodicCylinders',
     []),
    ('pysph_tpu.examples.sloshing_tank_horizontal', 'SloshingTank',
     ['--dx', '0.02']),
    ('pysph_tpu.examples.solid_mech.oscillating_plate', 'OscillatingPlate', []),
    ('pysph_tpu.examples.surface_tension.square_droplet', 'SquareDroplet', []),
    ('pysph_tpu.examples.gas_dynamics.noh', 'NohImplosion', ['--nx', '24']),
    ('pysph_tpu.examples.gas_dynamics.acoustic_wave', 'AcousticWave',
     ['--nparticles', '64']),
    ('pysph_tpu.examples.shallow_water.rectangular_dambreak', 'RectangularDamBreak',
     ['--dx', '0.1']),
    ('pysph_tpu.examples.flow_past_cylinder_2d', 'WindTunnel',
     ['--nx', '6', '--lt', '10', '--wt', '6']),
    ('pysph_tpu.examples.flow_past_cylinder_2d', 'WindTunnel',
     ['--nx', '6', '--lt', '10', '--wt', '6', '--io-method',
      'mirror']),
    ('pysph_tpu.examples.flow_past_cylinder_2d', 'WindTunnel',
     ['--nx', '6', '--lt', '10', '--wt', '6', '--io-method',
      'hybrid']),
    ('pysph_tpu.examples.gas_dynamics.blastwave', 'Blastwave', ['--nl', '80']),
    ('pysph_tpu.examples.gas_dynamics.wallshock', 'WallShock', ['--nl', '80']),
    ('pysph_tpu.examples.gas_dynamics.sjogreen', 'SjoGreen', ['--nl', '80']),
    ('pysph_tpu.examples.gas_dynamics.robert', 'Robert', ['--nl', '80']),
    ('pysph_tpu.examples.shallow_water.cylindrical_dambreak_sloping_bed',
     'CylindricalDamBreakSlopingBed', ['--n', '15']),
    ('pysph_tpu.examples.shallow_water.rectangular_dambreak_sloping_bed',
     'RectangularDamBreakSlopingBed', ['--dx', '0.1']),
    ('pysph_tpu.examples.shallow_water.rectangular_dambreak_particle_split',
     'RectangularDamBreakSplit', ['--dx', '0.1']),
    ('pysph_tpu.examples.shallow_water.rectangular_dambreak_particle_split_and_merge',
     'RectangularDamBreakSplitMerge', ['--dx', '0.1']),
    ('pysph_tpu.examples.spheric.moving_square', 'MovingSquare',
     ['--nx', '12']),
    ('pysph_tpu.examples.sloshing.sloshing_tank_pitch', 'SloshingTankPitch',
     ['--dx', '0.06']),
    ('pysph_tpu.examples.surface_tension.circular_droplet', 'CircularDroplet', []),
    ('pysph_tpu.examples.gas_dynamics.kelvin_helmholtz_instability', 'KHInstability',
     ['--nx', '40']),
    ('pysph_tpu.examples.gas_dynamics.kelvin_helmholtz_instability', 'KHInstability',
     ['--nx', '40', '--scheme', 'adke']),
    ('pysph_tpu.examples.rigid_body.dam_break3D_sph', 'DamBreak3DRigid',
     ['--dx', '0.06']),
    ('pysph_tpu.examples.naca_airfoil_2d', 'NACAWindTunnel',
     ['--nx', '6', '--lt', '10', '--wt', '6']),
    ('pysph_tpu.examples.solid_mech.impact', 'Impact',
     ['--dx', '0.0005']),
    ('pysph_tpu.examples.solid_mech.impact3d', 'Impact3D',
     ['--dx', '0.001']),
    ('pysph_tpu.examples.solid_mech.taylor_bar', 'TaylorBar',
     ['--dx', '0.0012']),
    ('pysph_tpu.examples.dam_break.db_2d_buchner', 'DamBreak2DBuchner',
     ['--dx', '0.08']),
    ('pysph_tpu.examples.dam_break.dam_break_3d_lobovsky',
     'DamBreak3DLobovsky', ['--dx', '0.06']),
    ('pysph_tpu.examples.dam_break.db_3d_yeh', 'DamBreak3DYeh',
     ['--dx', '0.06']),
    ('pysph_tpu.examples.gas_dynamics.sod_shocktube', 'SodShockTube',
     ['--nl', '100']),
    ('pysph_tpu.examples.gas_dynamics.sod_shocktube', 'SodShockTube',
     ['--nl', '100', '--scheme', 'crk']),
    ('pysph_tpu.examples.gas_dynamics.wc_blastwave', 'WCBlastwave',
     ['--nparticles', '200']),
    ('pysph_tpu.examples.gas_dynamics.cheng_shu_1d', 'ChengShu',
     ['--n-particles', '200']),
    ('pysph_tpu.examples.gas_dynamics.hydrostatic_box', 'HydrostaticBox',
     ['--nx', '20']),
    ('pysph_tpu.examples.gas_dynamics.accuracy_test_2d', 'AccuracyTest2D',
     ['--nparticles', '24']),
    ('pysph_tpu.examples.gas_dynamics.riemann_2d', 'Riemann2D',
     ['--nparticles', '40']),
    ('pysph_tpu.examples.surface_tension.equilibrium_rod', 'MultiPhase', []),
    ('pysph_tpu.examples.surface_tension.equilibrium_rod_hex',
     'MultiPhaseHex', []),
    ('pysph_tpu.examples.surface_tension.capillary_wave', 'MultiPhase', []),
    ('pysph_tpu.examples.sphysics.case1', 'Dambreak2D', ['--dx', '0.08']),
    ('pysph_tpu.examples.sphysics.case2', 'Dambreak_2D', ['--dx', '0.012']),
    ('pysph_tpu.examples.sphysics.case3', 'WavesPaddle2D', ['--dx', '0.03']),
    ('pysph_tpu.examples.sphysics.case4', 'Tsunami2D', ['--dx', '0.1']),
    ('pysph_tpu.examples.sphysics.case8', 'Dambreak2D', ['--dx', '0.06']),
    ('pysph_tpu.examples.shallow_water.still_water_over_a_hump_1d',
     'StillWaterOverHump', ['--dx', '0.02']),
    ('pysph_tpu.examples.shallow_water.still_water_over_a_step_1d',
     'StillWaterOveraStep', ['--dx', '0.02']),
    ('pysph_tpu.examples.shallow_water.still_water_over_a_parabolic_surface_1d',
     'StillWaterOverParabola', ['--dx', '40']),
    ('pysph_tpu.examples.shallow_water.rectangular_dambreak_wetbed_1d',
     'RectangularDamBreak', []),
    ('pysph_tpu.examples.shallow_water.cylindrical_dambreak_closed_boundary',
     'CylindricalDamBreakClosedBoundary', ['--n', '12']),
    ('pysph_tpu.examples.shallow_water.cylindrical_dambreak_particle_split',
     'CylindricalDamBreakSplit', ['--n', '12']),
    ('pysph_tpu.examples.shallow_water.particle_split_in_a_square_domain',
     'ParticleSplitTest', []),
    ('pysph_tpu.examples.shallow_water.rectangular_channel_flow',
     'RectangularOpenChannelFlow',
     ['--dx', '40', '--le', '400', '--w', '200']),
    ('pysph_tpu.examples.shallow_water.thacker_basin', 'ThackerBasin',
     ['--n', '10']),
    ('pysph_tpu.examples.sloshing.st_bouscasse', 'SloshingTank',
     ['--dx', '0.01']),
    ('pysph_tpu.examples.rigid_body.simple', 'SimpleRigidMotion', []),
    ('pysph_tpu.examples.sphysics.case5', 'Case5', ['--dx', '0.1']),
    ('pysph_tpu.examples.sphysics.case6', 'WavesPaddle2D',
     ['--dx', '0.04']),
    ('pysph_tpu.examples.sphysics.case7', 'WavesPaddle2D',
     ['--dx', '0.05']),
    ('pysph_tpu.examples.sphysics.dam_break', 'DamBreak',
     ['--dx', '0.06']),
    ('pysph_tpu.examples.tg_with_packed_particles', 'TGPacked',
     ['--nx', '20']),
    ('pysph_tpu.examples.cube', 'Cube', ['--np', '500']),
    ('pysph_tpu.examples.dam_break_3d', 'DamBreak3D', ['--dx', '0.12']),
    ('pysph_tpu.examples.elliptical_drop_no_scheme', 'EllipticalDrop',
     ['--nx', '20']),
    ('pysph_tpu.examples.poiseuille', 'PoiseuilleFlow', []),
    ('pysph_tpu.examples.lattice_cylinders', 'LatticeCylinders', []),
    ('pysph_tpu.examples.fpc_with_packed_cylinder', 'FPCWithPackedCylinder',
     ['--nx', '6', '--lt', '10', '--wt', '6']),
    ('pysph_tpu.examples.trivial_inlet_outlet', 'InletOutletApp', []),
    ('pysph_tpu.examples.solid_mech.rings', 'Rings', []),
    ('pysph_tpu.examples.rigid_body.bouncing_cube', 'BouncingCube', []),
    ('pysph_tpu.examples.rigid_body.bouncing_cubes', 'BouncingCubes', []),
    ('pysph_tpu.examples.rigid_body.cubes_colliding_in_tank',
     'RigidFluidCoupling', []),
    ('pysph_tpu.examples.rigid_body.solid_body_floating_in_tank',
     'RigidFluidCoupling', []),
    ('pysph_tpu.examples.rigid_body.sphere_in_vessel_akinci',
     'RigidFluidCoupling', []),
    ('pysph_tpu.examples.rigid_body.ten_spheres_in_vessel_2d',
     'RigidFluidCoupling', []),
    ('pysph_tpu.examples.rigid_body.three_cubes_in_vessel_3d',
     'RigidFluidCoupling', []),
    ('pysph_tpu.examples.rigid_body.three_spheres_in_fluid',
     'RigidFluidCoupling', []),
    ('pysph_tpu.examples.surface_tension.interface_instability',
     'MultiPhase', []),
    ('pysph_tpu.examples.surface_tension.khi_sy11', 'SquareDroplet', []),
    ('pysph_tpu.examples.surface_tension.khi_tvf', 'KHITVF', []),
    ('pysph_tpu.examples.surface_tension.oscillating_rod', 'MultiPhase',
     []),
]

# Apps driven by external benchmark data distributions (NOAA Monai
# Valley bathymetry, SPHysics INDAT/IPART); smoke-run only when the
# files are present next to the script (ref
# examples/tests/test_examples.py skips the same way via
# get_files/remote data).
DATA_EXAMPLES = [
    ('pysph_tpu.examples.shallow_water.okushiri_tsunami',
     'OkushiriTsunami', [],
     'pysph_tpu/examples/shallow_water/okushiri_tsunami_input_files'),
    ('pysph_tpu.examples.sphysics.dambreak_sphysics',
     'DamBreak3DSPhysics', [], 'pysph_tpu/examples/sphysics/INDAT.gz'),
]


def _run_example(module, cls, extra):
    mod = importlib.import_module(module)
    app_cls = getattr(mod, cls)
    tmpdir = tempfile.mkdtemp()
    argv = ['--max-steps', '2', '-d', tmpdir, '-q',
            '--disable-output'] + extra
    old_argv = sys.argv
    try:
        sys.argv = [module]
        app = app_cls()
        app.run(argv)
        for pa in app.particles:
            assert np.all(np.isfinite(pa.x))
            assert np.all(np.isfinite(pa.u))
        # some cases reach tf in a single step (tf == dt)
        assert 1 <= app.solver.count <= 2
    finally:
        sys.argv = old_argv
        shutil.rmtree(tmpdir, ignore_errors=True)


@pytest.mark.slow
@pytest.mark.parametrize('module,cls,extra', EXAMPLES)
def test_example_runs(module, cls, extra):
    _run_example(module, cls, extra)


@pytest.mark.slow
@pytest.mark.parametrize('module,cls,extra,data', [
    pytest.param(m, c, e, d, marks=pytest.mark.skipif(
        not os.path.exists(d), reason='benchmark data files not present'))
    for m, c, e, d in DATA_EXAMPLES])
def test_data_example_runs(module, cls, extra, data):
    _run_example(module, cls, extra)
