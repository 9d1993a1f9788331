"""Mirror-ghost outlet (parity with
/root/reference/pysph/sph/bc/mirror/outlet.py)."""

import numpy as np

from pysph_tpu.sph.bc.inlet_outlet_manager import OutletBase


class Outlet(OutletBase):
    def _get_ghost_xyz(self, x, y, z):
        xij = x - self.x
        yij = y - self.y
        zij = z - self.z
        disp = xij * self.xn + yij * self.yn + zij * self.zn
        return (x - 2 * disp * self.xn, y - 2 * disp * self.yn,
                z - 2 * disp * self.zn)

    def update(self, time, dt, stage):
        if not self._init:
            self.initialize()
            self._init = True
        if stage not in self.active_stages:
            return
        outlet_pa = self.outlet_pa
        source_pa = self.source_pa
        ghost_pa = self.ghost_pa

        self.io_eval = self._create_io_eval()
        self.io_eval.evaluate()

        io_id = np.asarray(source_pa.ioid)
        all_idx = np.where(io_id == 1)[0]
        pa_add = source_pa.extract_particles(
            all_idx, props=self.props_to_copy)
        outlet_pa.add_particles(**pa_add.get_property_arrays())

        if ghost_pa is not None and len(all_idx) > 0:
            x, y, z = self._get_ghost_xyz(
                np.asarray(pa_add.x), np.asarray(pa_add.y),
                np.asarray(pa_add.z))
            props = pa_add.get_property_arrays()
            props['x'] = x
            props['y'] = y
            props['z'] = z
            props['u'] = -1.0 * np.asarray(pa_add.u)
            ghost_pa.add_particles(**props)
        source_pa.remove_particles(all_idx)

        io_id = np.asarray(outlet_pa.ioid)
        all_idx = np.where(io_id == 2)[0]
        outlet_pa.remove_particles(all_idx)
        if ghost_pa is not None:
            ghost_pa.remove_particles(all_idx)
        if self.callback is not None:
            self.callback(source_pa, outlet_pa)
