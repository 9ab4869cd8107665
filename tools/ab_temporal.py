"""Real-TPU A/B for pure-fluid temporal blocking (fused_step_fluid_multi).

One TPU client does everything (attachment init is expensive and
degrades with churn - CLAUDE.md):
  1. compiled-parity probe: k=8 multi kernel vs 8 oracle steps at
     1024^2 (catches Mosaic-only miscompiles interpret mode cannot see)
  2. marginal step timing at 4096^2 for k in (1, 4, 8): one compiled
     chunk length, re-run; sync via device->host fetch.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_temporal.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from lbmdem_tpu.config import SimConfig
from lbmdem_tpu.ops import lbm, pallas_lbm


def sync(x):
    jax.device_get(jnp.sum(x))


def parity_probe():
    cfg = SimConfig(nx=1024, ny=1024, tau=0.8, gy=-1e-5, uw_north=0.05,
                    dtype="float32")
    rng = np.random.default_rng(0)
    import lbmdem_tpu.lattice as lattice

    base = lattice.W[:, None, None].astype(np.float32)
    f = jnp.asarray(
        base * (1.0 + 0.05 * rng.standard_normal((9, 1024, 1024))).astype(np.float32)
    )
    t0 = time.perf_counter()
    ref = f
    orc = jax.jit(lambda x: lbm.step_pure_fluid(x, cfg))
    for _ in range(8):
        ref = orc(ref)
    got = jax.jit(lambda x: pallas_lbm.fused_step_fluid_multi(x, cfg, 8))(f)
    d = float(jnp.max(jnp.abs(got - ref)))
    print(f"parity probe 1024^2 k=8: max|diff|={d:.3e} "
          f"({time.perf_counter() - t0:.0f}s incl compile)", flush=True)
    assert d < 2e-6, "COMPILED PARITY FAILURE"


def openbc_parity_probe():
    """Compiled probe of the Zou/He-in-window temporal path (the
    closure's rolls/selects are Mosaic-sensitive; interpret mode
    cannot catch a miscompile)."""
    cfg = SimConfig(nx=1024, ny=1024, tau=0.7, dtype="float32",
                    bc_west="inlet", bc_east="outlet", u_inlet=0.06,
                    inlet_profile="poiseuille")
    rng = np.random.default_rng(2)
    import lbmdem_tpu.lattice as lattice

    base = lattice.W[:, None, None].astype(np.float32)
    f = jnp.asarray(
        base * (1.0 + 0.02 * rng.standard_normal((9, 1024, 1024))).astype(np.float32)
    )
    t0 = time.perf_counter()
    ref = f
    orc = jax.jit(lambda x: lbm.step_pure_fluid(x, cfg))
    for _ in range(8):
        ref = orc(ref)
    got = jax.jit(lambda x: pallas_lbm.fused_step_fluid_multi(x, cfg, 8))(f)
    d = float(jnp.max(jnp.abs(got - ref)))
    print(f"openbc temporal parity probe 1024^2 k=8: max|diff|={d:.3e} "
          f"({time.perf_counter() - t0:.0f}s incl compile)", flush=True)
    assert d < 5e-6, "COMPILED OPENBC TEMPORAL PARITY FAILURE"


def bench(n, k, chunk_steps=400, repeats=3, storage="float32"):
    cfg = SimConfig(nx=n, ny=n, tau=0.8, gx=1e-6, dtype="float32",
                    f_storage=storage)
    f = lbm.to_storage(lbm.init_equilibrium(cfg), cfg)
    scr = jnp.zeros_like(f)

    def chunk(f, scr):
        def double(c):
            f, scr = c
            if k == 1:
                f1 = pallas_lbm.fused_step_fluid(f, cfg, out_buf=scr)
                f2 = pallas_lbm.fused_step_fluid(f1, cfg, out_buf=f)
            else:
                f1 = pallas_lbm.fused_step_fluid_multi(f, cfg, k, out_buf=scr)
                f2 = pallas_lbm.fused_step_fluid_multi(f1, cfg, k, out_buf=f)
            return f2, f1

        return jax.lax.fori_loop(0, chunk_steps // (2 * k),
                                 lambda _, c: double(c), (f, scr))

    cj = jax.jit(chunk, donate_argnums=(0, 1))
    t0 = time.perf_counter()
    f, scr = cj(f, scr)
    sync(f)
    print(f"  k={k}: compile+first {time.perf_counter() - t0:.0f}s", flush=True)
    best = 1e9
    nst = (chunk_steps // (2 * k)) * 2 * k
    for _ in range(repeats):
        t0 = time.perf_counter()
        f, scr = cj(f, scr)
        sync(f)
        best = min(best, time.perf_counter() - t0)
    ms = best / nst * 1e3
    mlups = n * n * nst / best / 1e6
    print(f"  k={k}: {ms:.3f} ms/step = {mlups:.0f} MLUPS", flush=True)
    return mlups


def prehalo_parity_probe():
    """Compile the PREHALO multi kernel (SMEM edge flags, in-kernel BB,
    shifted prehalo DMA offsets) on the real chip without a mesh: a
    1-shard ring exchange is wrap (lo = f[-8:], hi = f[:8]) and the
    single shard holds every global edge (edges = all-on). Interpret
    mode cannot catch Mosaic-only miscompiles in this variant (see the
    aliasing lesson in CLAUDE.md)."""
    cfg = SimConfig(nx=1024, ny=1024, tau=0.7, gy=-1e-5, uw_north=0.05,
                    bc_west="wall", bc_east="wall", dtype="float32")
    rng = np.random.default_rng(1)
    import lbmdem_tpu.lattice as lattice

    base = lattice.W[:, None, None].astype(np.float32)
    f = jnp.asarray(
        base * (1.0 + 0.05 * rng.standard_normal((9, 1024, 1024))).astype(np.float32)
    )
    t0 = time.perf_counter()
    ref = f
    orc = jax.jit(lambda x: lbm.step_pure_fluid(x, cfg))
    for _ in range(4):
        ref = orc(ref)

    def khalo(x):
        ext = jnp.concatenate([x[:, -8:, :], x, x[:, :8, :]], axis=1)
        edges = jnp.ones((4,), jnp.int32)
        return pallas_lbm.fused_step_fluid_multi(ext, cfg, 4, prehalo=True,
                                                 edges=edges)

    got = jax.jit(khalo)(f)
    d = float(jnp.max(jnp.abs(got - ref)))
    print(f"prehalo parity probe 1024^2 k=4: max|diff|={d:.3e} "
          f"({time.perf_counter() - t0:.0f}s incl compile)", flush=True)
    assert d < 2e-6, "COMPILED PREHALO PARITY FAILURE"


if __name__ == "__main__":
    import sys

    print("devices:", jax.devices(), flush=True)
    parity_probe()
    prehalo_parity_probe()
    openbc_parity_probe()
    print("bench 4096^2 pure fluid:", flush=True)
    for k in (1, 4, 8):
        bench(4096, k)
    if "--bf16" in sys.argv:
        # the 16-row bf16 halo granule admits k <= 16
        print("bench 4096^2 pure fluid, bf16 f-storage:", flush=True)
        for k in (4, 8, 16):
            bench(4096, k, storage="bfloat16")
