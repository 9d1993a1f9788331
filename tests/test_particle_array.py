"""ParticleArray host-container and device-state tests."""

import numpy as np
import pickle

from pysph_tpu.base.particle_array import ParticleArray, ParticleTAGS
from pysph_tpu.base.utils import (
    get_particle_array, get_particle_array_wcsph)


def test_default_props():
    x = np.linspace(0, 1, 10)
    pa = get_particle_array(name='fluid', x=x)
    assert pa.name == 'fluid'
    assert pa.get_number_of_particles() == 10
    for prop in ('x', 'y', 'z', 'u', 'v', 'w', 'm', 'h', 'rho', 'p',
                 'au', 'av', 'aw', 'gid', 'pid', 'tag'):
        assert prop in pa.properties
    np.testing.assert_allclose(pa.x, x)
    np.testing.assert_allclose(pa.y, 0.0)
    assert pa.properties['tag'].dtype == np.int32
    assert pa.num_real_particles == 10


def test_constants_and_attribute_access():
    pa = get_particle_array(name='f', x=[1.0, 2.0],
                            constants={'c0': 10.0, 'vec': [1., 2., 3.]})
    np.testing.assert_allclose(pa.c0, [10.0])
    np.testing.assert_allclose(pa.vec, [1., 2., 3.])
    pa.x = [3.0, 4.0]
    np.testing.assert_allclose(pa.x, [3.0, 4.0])


def test_add_remove_extend():
    pa = get_particle_array(name='f', x=[0., 1., 2.])
    pa.add_property('foo', default=7.0)
    np.testing.assert_allclose(pa.foo, 7.0)
    pa.extend(2)
    assert pa.get_number_of_particles() == 5
    np.testing.assert_allclose(pa.properties['x'][3:], 0.0)
    pa.remove_particles([0, 4])
    assert pa.get_number_of_particles() == 3
    np.testing.assert_allclose(pa.properties['x'], [1., 2., 0.])


def test_strided_property():
    pa = get_particle_array(name='f', x=[0., 1.])
    pa.add_property('m_mat', stride=9)
    assert pa.properties['m_mat'].size == 18


def test_align_particles():
    pa = get_particle_array(name='f', x=[0., 1., 2., 3.])
    pa.properties['tag'][:] = [0, 2, 0, 1]
    pa.align_particles()
    assert list(pa.properties['tag']) == [0, 0, 2, 1]
    np.testing.assert_allclose(pa.properties['x'], [0., 2., 1., 3.])
    assert pa.num_real_particles == 2


def test_extract_and_append():
    pa = get_particle_array(name='f', x=[0., 1., 2., 3.])
    ex = pa.extract_particles([1, 3])
    assert ex.get_number_of_particles() == 2
    np.testing.assert_allclose(ex.x, [1., 3.])
    pa2 = get_particle_array(name='g', x=[10.0])
    pa2.append_parray(ex)
    assert pa2.get_number_of_particles() == 3
    np.testing.assert_allclose(sorted(pa2.x), [1., 3., 10.])


def test_device_roundtrip():
    pa = get_particle_array_wcsph(name='fluid', x=[0., 1., 2.],
                                  rho=[1., 1., 1.])
    state, cap = pa.to_device()
    assert cap == 128
    assert state['x'].shape == (128,)
    assert int(state['n_act']) == 3
    # padding slots are tagged Padding
    assert int(state['tag'][5]) == ParticleTAGS.Padding
    state['rho'] = state['rho'].at[0].set(2.0)
    pa.update_from_device(state)
    np.testing.assert_allclose(pa.rho, [2., 1., 1.])


def test_device_strided_shape():
    pa = get_particle_array(name='f', x=[0., 1.])
    pa.add_property('m_mat', stride=9, data=np.arange(18, dtype=float))
    state, cap = pa.to_device()
    assert state['m_mat'].shape == (cap, 9)
    pa.update_from_device(state)
    np.testing.assert_allclose(pa.properties['m_mat'], np.arange(18))


def test_pickle_roundtrip():
    pa = get_particle_array(name='f', x=[0., 1., 2.],
                            constants={'c0': [9.0]})
    pa2 = pickle.loads(pickle.dumps(pa))
    assert pa2.name == 'f'
    np.testing.assert_allclose(pa2.x, pa.x)
    np.testing.assert_allclose(pa2.c0, [9.0])


def test_empty_clone():
    pa = get_particle_array(name='f', x=[0., 1.])
    clone = pa.empty_clone()
    assert clone.get_number_of_particles() == 0
    assert set(clone.properties) == set(pa.properties)
