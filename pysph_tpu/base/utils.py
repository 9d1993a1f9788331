"""Particle-array factories, mirroring /root/reference/pysph/base/utils.py."""

import numpy

from pysph_tpu.base.particle_array import (  # noqa: F401
    ParticleArray, ParticleTAGS, UINT_MAX, get_ghost_tag, get_local_tag,
    get_remote_tag,
)

DEFAULT_PROPS = set(
    ('x', 'y', 'z', 'u', 'v', 'w', 'm', 'h', 'rho', 'p',
     'au', 'av', 'aw', 'gid', 'pid', 'tag')
)


def get_particle_array(additional_props=None, constants=None, backend=None,
                       **props):
    """Create a particle array with the default SPH properties.

    Mirrors reference base/utils.py:47: default props are DEFAULT_PROPS;
    ``additional_props`` adds more; remaining keywords set property data.
    """
    name = props.pop('name', 'array')

    pa = ParticleArray(name=name, constants=constants)
    nparticles = 0
    for data in props.values():
        if data is not None:
            nparticles = max(nparticles, numpy.atleast_1d(
                numpy.asarray(data)).size)

    all_props = set(DEFAULT_PROPS)
    if additional_props:
        all_props = all_props.union(additional_props)
    all_props = all_props.union(props.keys())

    for prop in sorted(all_props):
        data = props.get(prop, None)
        if prop in ('tag', 'pid'):
            pa.add_property(prop, type='int', data=data, _n=nparticles)
        elif prop == 'gid':
            if data is None:
                data = numpy.arange(nparticles, dtype=numpy.uint32)
            pa.add_property(prop, type='unsigned int', data=data,
                            default=UINT_MAX, _n=nparticles)
        else:
            pa.add_property(prop, type='double', data=data, _n=nparticles)
    pa._update_num_real()
    pa.set_output_arrays(['x', 'y', 'z', 'u', 'v', 'w', 'rho', 'm', 'h',
                          'pid', 'gid', 'tag', 'p'])
    return pa


def get_particle_array_wcsph(constants=None, **props):
    """WCSPH particle array (reference base/utils.py:152)."""
    wcsph_props = ['cs', 'ax', 'ay', 'az', 'arho', 'x0', 'y0', 'z0',
                   'u0', 'v0', 'w0', 'rho0', 'div', 'dt_cfl', 'dt_force']
    pa = get_particle_array(
        constants=constants, additional_props=wcsph_props, **props)
    pa.set_output_arrays(['x', 'y', 'z', 'u', 'v', 'w', 'rho', 'm', 'h',
                          'pid', 'gid', 'tag', 'p'])
    return pa


def get_particle_array_iisph(constants=None, **props):
    """IISPH particle array (reference base/utils.py:193)."""
    iisph_props = ['uadv', 'vadv', 'wadv', 'rho_adv',
                   'au', 'av', 'aw', 'ax', 'ay', 'az',
                   'dii0', 'dii1', 'dii2', 'V', 'dt_cfl', 'dt_force',
                   'aii', 'dijpj0', 'dijpj1', 'dijpj2', 'p', 'p0', 'piter',
                   'compression']
    consts = {'tmp_comp': [0.0, 0.0]}
    if constants:
        consts.update(constants)
    pa = get_particle_array(
        constants=consts, additional_props=iisph_props, **props)
    pa.set_output_arrays(['x', 'y', 'z', 'u', 'v', 'w', 'rho', 'h', 'm',
                          'p', 'pid', 'au', 'av', 'aw', 'tag', 'gid', 'V'])
    return pa


def get_particle_array_rigid_body(constants=None, **props):
    """Rigid-body particle array (reference base/utils.py:238)."""
    extra_props = ['au', 'av', 'aw', 'V', 'fx', 'fy', 'fz', 'x0', 'y0', 'z0',
                   'tang_disp_x', 'tang_disp_y', 'tang_disp_z',
                   'tang_disp_x0', 'tang_disp_y0', 'tang_disp_z0',
                   'tang_velocity_x', 'tang_velocity_y', 'rad_s',
                   'tang_velocity_z', 'nx', 'ny', 'nz']
    body_id = props.pop('body_id', None)
    nb = 1 if body_id is None else int(numpy.max(body_id)) + 1
    consts = {'total_mass': numpy.zeros(nb, dtype=float),
              'num_body': numpy.asarray(nb, dtype=int),
              'cm': numpy.zeros(3 * nb, dtype=float),
              'mi': numpy.zeros(16 * nb, dtype=float),
              'force': numpy.zeros(3 * nb, dtype=float),
              'torque': numpy.zeros(3 * nb, dtype=float),
              'vc': numpy.zeros(3 * nb, dtype=float),
              'ac': numpy.zeros(3 * nb, dtype=float),
              'vc0': numpy.zeros(3 * nb, dtype=float),
              'omega': numpy.zeros(3 * nb, dtype=float),
              'omega0': numpy.zeros(3 * nb, dtype=float),
              'omega_dot': numpy.zeros(3 * nb, dtype=float)}
    if constants:
        consts.update(constants)
    pa = get_particle_array(constants=consts, additional_props=extra_props,
                            **props)
    n = pa.get_number_of_particles()
    if body_id is None:
        body_id = numpy.zeros(n, dtype=numpy.int32)
    pa.add_property('body_id', type='int', data=body_id, _n=n)
    pa.set_output_arrays(['x', 'y', 'z', 'u', 'v', 'w', 'rho', 'h', 'm',
                          'p', 'pid', 'au', 'av', 'aw', 'tag', 'gid', 'V',
                          'fx', 'fy', 'fz', 'body_id'])
    return pa


def get_particle_array_tvf_fluid(constants=None, **props):
    """TVF fluid particle array (reference base/utils.py:298)."""
    tv_props = ['uhat', 'vhat', 'what',
                'auhat', 'avhat', 'awhat', 'vmag2', 'V']
    pa = get_particle_array(
        constants=constants, additional_props=tv_props, **props)
    pa.set_output_arrays(['x', 'y', 'z', 'u', 'v', 'w', 'rho', 'p', 'h',
                          'm', 'au', 'av', 'aw', 'V', 'vmag2', 'pid', 'gid',
                          'tag'])
    return pa


def get_particle_array_tvf_solid(constants=None, **props):
    """TVF solid particle array (reference base/utils.py:329)."""
    tv_props = ['u0', 'v0', 'w0', 'V', 'wij', 'ax', 'ay', 'az',
                'uf', 'vf', 'wf', 'ug', 'vg', 'wg']
    pa = get_particle_array(
        constants=constants, additional_props=tv_props, **props)
    pa.set_output_arrays(['x', 'y', 'z', 'u', 'v', 'w', 'rho', 'p', 'h',
                          'm', 'V', 'pid', 'gid', 'tag'])
    return pa


def get_particle_array_gasd(constants=None, **props):
    """Gas-dynamics particle array (reference base/utils.py:360)."""
    required_props = [
        'x', 'y', 'z', 'u', 'v', 'w', 'rho', 'h', 'm', 'cs', 'p', 'e',
        'au', 'av', 'aw', 'arho', 'ae', 'am', 'ah', 'x0', 'y0', 'z0',
        'u0', 'v0', 'w0', 'rho0', 'e0', 'h0', 'div', 'grhox', 'grhoy',
        'grhoz', 'dwdh', 'omega', 'converged', 'alpha1', 'alpha2', 'del2e',
        'aalpha1', 'aalpha2', 'alpha10', 'alpha20',
        'dt_cfl', 'dt_force']
    pa = get_particle_array(
        constants=constants, additional_props=required_props, **props)
    pa.set_output_arrays(['x', 'y', 'z', 'u', 'v', 'w', 'rho', 'p', 'e',
                          'au', 'av', 'ae', 'pid', 'gid', 'tag', 'h',
                          'alpha1', 'alpha2'])
    return pa


def get_particle_array_swe(constants=None, **props):
    """Shallow-water particle array (reference base/utils.py:403)."""
    swe_props = ['A', 'cs', 'n', 'rho0', 'rho_prev_iter', 'rho_residual',
                 'positive_rho_residual', 'summation_rho', 'dw', 'alpha',
                 'exp_lambda', 'tv', 'tu', 'u_prev_step', 'v_prev_step',
                 'uh', 'vh', 'dt_cfl', 'pa_to_split', 'Sfx', 'Sfy', 'psi',
                 'sum_Ak', 'u_parent', 'v_parent', 'uh_parent', 'vh_parent',
                 'parent_idx', 'b', 'bx', 'by', 'bxx', 'bxy', 'byy',
                 'closest_idx', 'merge', 'dw_inner_reimann', 'u_inner_reimann',
                 'v_inner_reimann', 'shep_corr', 'is_merged_pa',
                 'dij_hat_x', 'dij_hat_y', 'ob_pa_to_remove',
                 'ob_pa_to_tag', 'pa_out_of_domain', 'is_wall_boun_pa',
                 'dw_at_t', 'pa_alpha_zero', 'fluid_pa_to_remove',
                 'au', 'av', 'aw', 'arho', 'rmin_tmp', 'V']
    pa = get_particle_array(
        constants=constants, additional_props=swe_props, **props)
    pa.add_constant('swe_conv', [0.0])
    pa.set_output_arrays(['x', 'y', 'u', 'v', 'rho', 'm', 'h', 'pid', 'gid',
                          'tag', 'p', 'A', 'dw'])
    return pa
