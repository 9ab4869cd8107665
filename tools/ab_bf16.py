"""Real-TPU A/B for shifted-bf16 f storage (cfg.f_storage='bfloat16').

One TPU client (attachment init is expensive - CLAUDE.md):
  1. compiled parity probe: bf16 fluid kernel vs the quantized oracle
     emulation at 1024^2 (catches Mosaic-only miscompiles)
  2. coupled bench at 4096^2/10k: f32 vs bf16 storage, marginal step
     timing on one compiled chunk
  3. physics: single-disk sedimentation, bf16 vs f32 settling-velocity
     trajectory (budget <1% - the BASELINE parity metric)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_bf16.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from lbmdem_tpu.config import SimConfig
from lbmdem_tpu.ops import lbm, pallas_lbm


def parity_probe():
    cfg = SimConfig(nx=1024, ny=1024, tau=0.8, gy=-1e-5, uw_north=0.05,
                    dtype="float32", f_storage="bfloat16")
    rng = np.random.default_rng(0)
    import lbmdem_tpu.lattice as lattice

    base = lattice.W[:, None, None].astype(np.float32)
    f = jnp.asarray(
        base * (1.0 + 0.05 * rng.standard_normal((9, 1024, 1024))).astype(np.float32)
    )
    fs = lbm.to_storage(f, cfg)
    t0 = time.perf_counter()
    ref = jax.jit(lambda x: lbm.to_storage(
        lbm.step_pure_fluid(lbm.from_storage(x, cfg), cfg), cfg))(fs)
    got = jax.jit(lambda x: pallas_lbm.fused_step_fluid(x, cfg))(fs)
    d = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
    print(f"bf16 parity probe 1024^2: max|diff|={d:.3e} "
          f"({time.perf_counter() - t0:.0f}s incl compile)", flush=True)
    assert d < 5e-4, "COMPILED BF16 PARITY FAILURE"


def bench_coupled(storage, chunk=100, repeats=3, coupling_k=1,
                  eps_method=None):
    from lbmdem_tpu.models import column_collapse
    from lbmdem_tpu.simulation import Simulation

    cfg, disks = column_collapse(nx=4096, ny=4096, n_disks=10000)
    cfg = cfg.replace(out_interval=10**9, f_storage=storage,
                      coupling_k=coupling_k)
    if eps_method:
        cfg = cfg.replace(eps_method=eps_method)
    label = storage + (f"/{eps_method}" if eps_method else "")
    if coupling_k > 1:
        label += f"/k={coupling_k}"
    sim = Simulation(cfg, disks, use_pallas=True)
    t0 = time.perf_counter()
    sim.run(chunk)
    print(f"  {label}: compile+first {time.perf_counter() - t0:.0f}s",
          flush=True)
    best = 1e9
    for _ in range(repeats):
        t0 = time.perf_counter()
        sim.run(chunk)
        best = min(best, time.perf_counter() - t0)
    mlups = 4096 * 4096 * chunk / best / 1e6
    print(f"  {label}: {best / chunk * 1e3:.3f} ms/step = {mlups:.0f} MLUPS",
          flush=True)
    return mlups


def settling_parity():
    from lbmdem_tpu.config import DiskSpec
    from lbmdem_tpu.simulation import Simulation

    cfg = SimConfig(nx=128, ny=256, tau=0.8, dtype="float32", g_py=-5e-5,
                    buoyancy=True, rho_s=2.0, kn=1.0, gamma_n=1.0, n_sub=20,
                    bc_west="wall", bc_east="wall", out_interval=10**9)
    disks = [DiskSpec(64.3, 200.0, 5.0)]
    vys = {}
    for storage in ("float32", "bfloat16"):
        sim = Simulation(cfg.replace(f_storage=storage), disks,
                         use_pallas=True)
        traj = []
        for _ in range(10):
            sim.run(100)
            traj.append(float(sim.state.disks.v[0, 1]))
        vys[storage] = np.asarray(traj)
        print(f"  {storage}: vy(t) = {np.array2string(vys[storage], precision=6)}",
              flush=True)
    scale = np.max(np.abs(vys["float32"]))
    rel = np.max(np.abs(vys["bfloat16"] - vys["float32"])) / scale
    print(f"bf16 settling-velocity deviation vs f32: {rel * 100:.3f}% "
          f"(budget 1%)", flush=True)
    assert rel < 0.01


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    parity_probe()
    print("settling parity (128x256, compiled):", flush=True)
    settling_parity()
    print("bench 4096^2/10k coupled:", flush=True)
    m32 = bench_coupled("float32")
    mbf = bench_coupled("bfloat16")
    print(f"bf16 speedup: {mbf / m32:.3f}x", flush=True)
