"""Real-TPU A/B for the solid-fraction coverage model (cfg.eps_method).

Both issue-latency-bound per-disk kernel loops — the stamp
(pallas_stamp._stamp_kernel) AND the in-kernel hydro reduce
(pallas_stamp.reduce_partials_banded via pallas_lbm._imb_reduce_kernel)
— recompute per-disk coverage with _cov_field, so the coverage model's
chain length is a direct multiplier on the two largest rows of the
coupled step profile (docs/performance.md: reduce 3.25 ms + stamp
2.15 ms of the 8.4 ms f32 step at 4096^2/10k). eps_method:

  "sample" (default): eps_samples^2 = 16 subgrid compare-accumulates —
      reference-style cell saturation, the parity baseline.
  "ramp": clip(r + 1/2 - d, 0, 1) — one sqrt + clip, a much shorter
      serial chain but a different (linear, ~1-cell) interface model.
  "exact": analytic tangent-plane overlap — most accurate, measured
      SLOWER (one long serial sqrt/reciprocal chain; performance.md).

This tool measures, in one TPU client: (1) the coupled step at
4096^2/10k for sample vs ramp (f32 and, with --bf16, the bf16-storage
combination), and (2) the settling-velocity deviation ramp-vs-sample on
the compiled path — the interface-model delta a user accepts when
opting into the speed tier. Results are recorded in
docs/performance.md; "sample" stays the default (golden trajectories
and the <1% reference-parity budget are pinned on it).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_eps.py [--bf16] [--cylinder]
"""

import sys
import time

import jax
import numpy as np

from lbmdem_tpu.config import DiskSpec, SimConfig


def bench_coupled(eps_method, storage="float32", chunk=100, repeats=3):
    from lbmdem_tpu.models import column_collapse
    from lbmdem_tpu.simulation import Simulation

    cfg, disks = column_collapse(nx=4096, ny=4096, n_disks=10000)
    cfg = cfg.replace(out_interval=10**9, eps_method=eps_method,
                      f_storage=storage)
    sim = Simulation(cfg, disks, use_pallas=True)
    t0 = time.perf_counter()
    sim.run(chunk)
    print(f"  {eps_method}/{storage}: compile+first "
          f"{time.perf_counter() - t0:.0f}s", flush=True)
    best = 1e9
    for _ in range(repeats):
        t0 = time.perf_counter()
        sim.run(chunk)
        best = min(best, time.perf_counter() - t0)
    mlups = 4096 * 4096 * chunk / best / 1e6
    print(f"  {eps_method}/{storage}: {best / chunk * 1e3:.3f} ms/step "
          f"= {mlups:.0f} MLUPS", flush=True)
    return mlups


def settling_delta():
    """Compiled settling trajectory, ramp vs sample: the coverage-model
    physics delta (reported, loosely bounded — this is an interface-
    model difference, not an error budget; the <1% parity budget
    applies to the DEFAULT method only)."""
    from lbmdem_tpu.simulation import Simulation

    cfg = SimConfig(nx=128, ny=256, tau=0.8, dtype="float32", g_py=-5e-5,
                    buoyancy=True, rho_s=2.0, kn=1.0, gamma_n=1.0, n_sub=20,
                    bc_west="wall", bc_east="wall", out_interval=10**9)
    disks = [DiskSpec(64.3, 200.0, 5.0)]
    vys = {}
    for method in ("sample", "ramp"):
        sim = Simulation(cfg.replace(eps_method=method), disks,
                         use_pallas=True)
        traj = []
        for _ in range(10):
            sim.run(100)
            traj.append(float(sim.state.disks.v[0, 1]))
        vys[method] = np.asarray(traj)
        print(f"  {method}: vy(t) = "
              f"{np.array2string(vys[method], precision=6)}", flush=True)
    scale = np.max(np.abs(vys["sample"]))
    rel = np.max(np.abs(vys["ramp"] - vys["sample"])) / scale
    print(f"ramp-vs-sample settling-velocity delta: {rel * 100:.3f}% "
          f"(interface-model difference, loose bound 5%)", flush=True)
    assert rel < 0.05
    return rel


def cylinder_drag_delta():
    """Schafer-Turek 2D-1 cD with ramp coverage (the diffuse-interface
    drag bias is the observable most sensitive to the coverage model)."""
    from lbmdem_tpu.models import make_scenario
    from lbmdem_tpu.simulation import Simulation

    out = {}
    for method in ("sample", "ramp"):
        cfg, disks = make_scenario("schafer_turek")
        cfg = cfg.replace(dtype="float32", out_interval=10**9,
                          eps_method=method)
        sim = Simulation(cfg, disks)
        sim.run(30000)
        F, _ = sim.hydro_forces()
        u_mean = (2.0 / 3.0) * cfg.u_inlet
        cd = float(F[0, 0]) / (0.5 * cfg.rho0 * u_mean**2 * 20.0)
        out[method] = cd
        print(f"  {method}: cD = {cd:.4f} "
              f"({abs(cd - 5.5795) / 5.5795:+.2%} vs 5.5795)", flush=True)
    return out


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    print("settling delta (128x256, compiled):", flush=True)
    settling_delta()
    print("bench 4096^2/10k coupled:", flush=True)
    ms = bench_coupled("sample")
    mr = bench_coupled("ramp")
    print(f"ramp speedup (f32): {mr / ms:.3f}x", flush=True)
    if "--bf16" in sys.argv:
        msb = bench_coupled("sample", "bfloat16")
        mrb = bench_coupled("ramp", "bfloat16")
        print(f"ramp speedup (bf16 storage): {mrb / msb:.3f}x", flush=True)
    if "--cylinder" in sys.argv:
        print("schafer-turek 2D-1 drag (D=20, f32):", flush=True)
        cylinder_drag_delta()
