"""Test configuration: run on a virtual 8-device CPU mesh with float64.

The reference validates against float64 Cython; we enable jax x64 and force
the CPU backend with 8 virtual devices so multi-chip sharding tests run
without TPU hardware (SURVEY.md section 4 implication (e))."""

import os

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

# NOTE: the env var JAX_PLATFORMS is pinned to the TPU plugin in this image
# and is ignored when overridden via os.environ; jax.config works.
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

from pysph_tpu.config import get_config  # noqa: E402

get_config().use_double = True
