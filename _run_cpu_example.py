import sys
import jax
jax.config.update('jax_platforms', 'cpu')
import runpy
mod = sys.argv[1]
sys.argv = [mod] + sys.argv[2:]
runpy.run_module(mod, run_name='__main__')
