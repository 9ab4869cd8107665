"""Qualify the banded slab DEM kernel + fused lattice path at 8192^2.

Bypasses the slab_supported plane-size cap (which tracks the largest
VERIFIED compile) and measures: Mosaic compile time, step time, MLUPS,
and state sanity on the real TPU. On success, raise the cap in
ops/pallas_dem.py to cover the measured plane size.

Run: python tools/qualify_8192.py [n_disks]
"""

import sys
import time

import numpy as np


def main():
    n_disks = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
    from lbmdem_tpu.ops import pallas_dem
    from lbmdem_tpu.models import column_collapse
    from lbmdem_tpu.simulation import Simulation

    orig = pallas_dem.slab_supported
    pallas_dem.slab_supported = lambda grid, axis="y", **kw: True
    try:
        cfg, disks = column_collapse(nx=8192, ny=8192, n_disks=n_disks)
        cfg = cfg.replace(out_interval=10**9)
        sim = Simulation(cfg, disks, use_pallas=True)
        from lbmdem_tpu.ops.dem import DemGrid
        ncs, ncl, R, C, nb = pallas_dem.slab_dims(sim.grid, sim.dem_axis)
        print(f"axis={sim.dem_axis} plane R*C={R}x{C}={R*C} bands={nb}",
              flush=True)
        t0 = time.perf_counter()
        sim.run(50)
        print(f"compile+first: {time.perf_counter()-t0:.1f} s", flush=True)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            sim.run(50)
            best = min(best, time.perf_counter() - t0)
        print(f"MLUPS/chip: {8192*8192*50/best/1e6:.1f}")
        assert np.isfinite(np.asarray(sim.state.f[0, ::128, ::128])).all()
        print("overflow", int(sim.state.overflow))
        print("QUALIFIED OK")
    finally:
        pallas_dem.slab_supported = orig


if __name__ == "__main__":
    main()
