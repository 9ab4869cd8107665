"""Qualify the slim-slab coupling_k window kernel at 8192^2 (the r4
flagship tier that OOMed scoped VMEM in the driver bench: bf16
f-storage + ramp coverage + coupling_k=8, BENCH_r04 skipped_stages).

The r5 fix drops the 3 dead baked-force channels from the window slab
layout (ops/pallas_dem.py build_slabs(bake_forces=False): slabs shrink
11 -> 8 channels, ~25 MB less scoped VMEM at 504x512 planes), so this
measures: Mosaic compile time, MLUPS, overflow and state sanity of
exactly the config the driver bench runs as its biggest stage.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/qualify_k8.py
     [k] [storage] [eps]   (defaults: 8 bfloat16 ramp)
"""

import sys
import time

import numpy as np


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    storage = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    eps = sys.argv[3] if len(sys.argv) > 3 else "ramp"
    from lbmdem_tpu.models import column_collapse
    from lbmdem_tpu.ops import pallas_dem
    from lbmdem_tpu.simulation import Simulation

    cfg, disks = column_collapse(nx=8192, ny=8192, n_disks=40000)
    cfg = cfg.replace(out_interval=10**9, f_storage=storage,
                      eps_method=eps, coupling_k=k)
    sim = Simulation(cfg, disks, use_pallas=True)
    ncs, ncl, R, C, nb = pallas_dem.slab_dims(sim.grid, sim.dem_axis)
    print(f"axis={sim.dem_axis} plane R*C={R}x{C}={R * C} bands={nb} "
          f"k={k} storage={storage} eps={eps}", flush=True)
    chunk = 48  # cadence-multiple (bench.py stage geometry)
    t0 = time.perf_counter()
    sim.run(chunk)
    print(f"compile+first: {time.perf_counter() - t0:.1f} s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        sim.run(chunk)
        best = min(best, time.perf_counter() - t0)
    print(f"MLUPS/chip: {8192 * 8192 * chunk / best / 1e6:.1f}", flush=True)
    assert np.isfinite(np.asarray(sim.state.f[0, ::128, ::128])).all()
    print("overflow", int(sim.state.overflow))
    print("QUALIFY-K8 OK")


if __name__ == "__main__":
    main()
