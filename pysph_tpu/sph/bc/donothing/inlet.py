"""(parity with /root/reference/pysph/sph/bc/donothing/inlet.py)"""
from pysph_tpu.sph.bc.inlet_outlet_manager import InletBase


class Inlet(InletBase):
    pass
