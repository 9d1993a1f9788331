"""Global configuration for pysph_tpu.

Controls the default floating point dtype and engine sizing knobs.  The
reference framework (PySPH) uses float64 on CPU and float32 on GPU with a
``--use-double`` switch (see /root/reference/pysph/solver/application.py:944).
We mirror that: float32 is the TPU speed path, float64 (requires
``jax.config.update('jax_enable_x64', True)``) is the validation path.
"""

import os

import jax
import numpy as np


class Config(object):
    def __init__(self):
        self._use_double = False
        # Default max neighbors per particle (K).  Re-estimated on overflow.
        self.max_neighbors_2d = 64
        self.max_neighbors_3d = 128
        # Max particles fetched per cell in the stencil gather.
        self.cell_capacity_2d = 16
        self.cell_capacity_3d = 40
        # Chunk size for the blocked neighbor-list build.
        self.nbr_chunk_size = 2048
        # Run eligible pair phases in the fused pallas kernel
        # (ops/pallas_engine.py); falls back to the XLA roll engine
        # per group when a phase is ineligible.  'auto' (default)
        # enables it on TPU backends; interpret mode on CPU is only
        # for tests.
        self._use_pallas = os.environ.get('PYSPH_TPU_PALLAS', 'auto')

    @property
    def use_pallas(self):
        v = self._use_pallas
        if v == 'auto':
            import jax as _jax
            v = _jax.default_backend() in ('tpu', 'axon')
            self._use_pallas = v
        elif not isinstance(v, bool):
            v = v in ('1', 'true', 'True')
            self._use_pallas = v
        return self._use_pallas

    @use_pallas.setter
    def use_pallas(self, v):
        self._use_pallas = bool(v)

    @property
    def use_double(self):
        return self._use_double

    @use_double.setter
    def use_double(self, v):
        if v and not jax.config.read('jax_enable_x64'):
            jax.config.update('jax_enable_x64', True)
        self._use_double = v

    @property
    def float_dtype(self):
        return np.float64 if self._use_double else np.float32

    @property
    def int_dtype(self):
        return np.int32


_config = Config()


def get_config():
    return _config


def set_config(config):
    global _config
    _config = config


def use_double(flag=True):
    """Switch the default float dtype (enables jax x64 when True)."""
    _config.use_double = flag


if os.environ.get('PYSPH_TPU_USE_DOUBLE', '0') in ('1', 'true', 'True'):
    use_double(True)
