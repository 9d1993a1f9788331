"""Test configuration.

Default (fast/slow tiers): run on a virtual 8-device CPU mesh with
float64.  The reference validates against float64 Cython; we enable
jax x64 and force the CPU backend with 8 virtual devices so multi-chip
sharding tests run without TPU hardware (SURVEY.md section 4
implication (e)).  Pallas kernels run in interpret mode here.

Real-chip tier: ``PYSPH_TPU_TEST_TPU=1 pytest tests -m tpu`` keeps the
attached TPU backend (f32, Mosaic-compiled pallas) so shape rules,
VMEM limits and captured-constant checks — invisible in interpret
mode — are exercised before they can ship (the round-3 resident
engine passed every CPU test and crashed on hardware)."""

import os

TPU_TIER = os.environ.get('PYSPH_TPU_TEST_TPU', '0') == '1'

if not TPU_TIER:
    flags = os.environ.get('XLA_FLAGS', '')
    if 'xla_force_host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (
            flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

if not TPU_TIER:
    # NOTE: the env var JAX_PLATFORMS is pinned to the TPU plugin in this
    # image and is ignored when overridden via os.environ; jax.config
    # works.
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)

# Persistent compilation cache: the fast tier is dominated by jit
# compiles of full solver steps on the 8-device mesh (measured 12+ min
# cold); with the cache warm it drops under ~4 min.  Keyed by backend,
# so the CPU-mesh test compiles never collide with TPU runs.
#
# The dir name embeds a hash of the HOST CPU feature flags: cached
# XLA:CPU executables encode machine features, and loading an entry
# compiled on a different box SIGABRTs mid-test (observed in round 5
# after the workspace moved to a machine without avx512 pseudo-
# features — jax's own cache key does not cover this).


def _host_cpu_tag():
    import hashlib
    try:
        with open('/proc/cpuinfo') as f:
            for line in f:
                if line.startswith('flags'):
                    return hashlib.md5(
                        line.encode()).hexdigest()[:8]
    except OSError:
        pass
    import platform
    return hashlib.md5(platform.processor().encode()).hexdigest()[:8]


_cache_dir = os.environ.get(
    'PYSPH_TPU_TEST_CACHE',
    # OPT-IN (round-5 finding): loading persisted XLA:CPU executables
    # is unreliable on this stack — large 8-device slow-tier programs
    # SIGABRT/SIGSEGV inside compilation_cache.get_executable_and_time
    # on load (host-feature mismatch after a machine change, and
    # same-host segfaults for the big multi-device entries).  The
    # fast tier costs ~14 min cold vs ~7 warm on one core; a cache
    # that can crash the suite is not worth the 7 minutes.  Set
    # PYSPH_TPU_TEST_CACHE=<dir> to re-enable locally.
    '')
if _cache_dir:
    jax.config.update('jax_compilation_cache_dir', _cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs',
                      0.5)
    jax.config.update(
        'jax_persistent_cache_min_entry_size_bytes', -1)
    # jax-level cache only: the XLA:CPU AOT sub-cache re-checks host
    # CPU features against its own pseudo-features
    # (prefer-no-scatter) and spams SIGILL warnings on reload
    jax.config.update('jax_persistent_cache_enable_xla_caches',
                      'none')

from pysph_tpu.config import get_config  # noqa: E402

if not TPU_TIER:
    get_config().use_double = True
