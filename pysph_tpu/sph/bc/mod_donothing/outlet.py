"""(parity with /root/reference/pysph/sph/bc/mod_donothing/outlet.py)"""
from pysph_tpu.sph.bc.inlet_outlet_manager import OutletBase


class Outlet(OutletBase):
    pass
