"""Real-TPU A/B of the fused lattice kernel's tile shape (VERDICT r3
next #1: the lattice pass is the largest post-ramp profile row; th
64 -> 128/256 cuts the halo read amplification (1+16/TH)(1+256/TW)
1.56x -> 1.41x -> 1.33x at tw=1024 and halves/quarters the per-step
launch count).

Tile shapes ride the LBMDEM_TH / LBMDEM_TW env overrides in
pallas_lbm.tile_dims, read at TRACE time - each config builds fresh
jitted closures so every shape really recompiles. Each config runs:

  1. a compiled parity probe at 1024^2 (k=4 multi kernel vs oracle -
     catches Mosaic miscompiles AND the historical remote-compile
     HTTP 500 at th=128 on a cheap program before the big grids spend
     budget),
  2. pure-fluid 4096^2 k=4 marginal timing,
  3. static-hoist coupled 4096^2/4096 fixed disks,
  4. (--coupled) full coupled 4096^2/10k f32/sample.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_tiles.py \
      [--configs 64x1024,128x1024,256x1024] [--coupled] [--bf16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    jax.device_get(jnp.sum(x))


def set_tiles(th, tw):
    os.environ["LBMDEM_TH"] = str(th)
    os.environ["LBMDEM_TW"] = str(tw)


def parity_probe(storage="float32"):
    from lbmdem_tpu.config import SimConfig
    from lbmdem_tpu.ops import lbm, pallas_lbm

    cfg = SimConfig(nx=1024, ny=1024, tau=0.8, gy=-1e-5, uw_north=0.05,
                    dtype="float32", f_storage=storage)
    rng = np.random.default_rng(0)
    import lbmdem_tpu.lattice as lattice

    base = lattice.W[:, None, None].astype(np.float32)
    f0 = (base * (1.0 + 0.05 * rng.standard_normal((9, 1024, 1024)))
          ).astype(np.float32)
    f = lbm.to_storage(jnp.asarray(f0), cfg)
    t0 = time.perf_counter()
    ref = jnp.asarray(f0)
    ocfg = cfg.replace(f_storage="float32")
    orc = jax.jit(lambda x: lbm.step_pure_fluid(x, ocfg))
    for _ in range(4):
        ref = orc(ref)
    got = jax.jit(
        lambda x: pallas_lbm.fused_step_fluid_multi(x, cfg, 4))(f)
    got = lbm.from_storage(got, cfg)
    d = float(jnp.max(jnp.abs(got - ref)))
    tol = 2e-6 if storage == "float32" else 5e-3
    print(f"  parity 1024^2 k=4 [{storage}]: max|diff|={d:.3e} "
          f"({time.perf_counter() - t0:.0f}s incl compile)", flush=True)
    assert d < tol, f"COMPILED PARITY FAILURE at tiles {os.environ['LBMDEM_TH']}x{os.environ['LBMDEM_TW']}"


def bench_fluid(n=4096, k=4, chunk_steps=400, repeats=3,
                storage="float32"):
    from lbmdem_tpu.config import SimConfig
    from lbmdem_tpu.ops import lbm, pallas_lbm

    cfg = SimConfig(nx=n, ny=n, tau=0.8, gx=1e-6, dtype="float32",
                    f_storage=storage)
    f = lbm.to_storage(lbm.init_equilibrium(cfg), cfg)
    scr = jnp.zeros_like(f)

    def chunk(f, scr):
        def double(c):
            f, scr = c
            f1 = pallas_lbm.fused_step_fluid_multi(f, cfg, k, out_buf=scr)
            f2 = pallas_lbm.fused_step_fluid_multi(f1, cfg, k, out_buf=f)
            return f2, f1

        return jax.lax.fori_loop(0, chunk_steps // (2 * k),
                                 lambda _, c: double(c), (f, scr))

    cj = jax.jit(chunk, donate_argnums=(0, 1))
    t0 = time.perf_counter()
    f, scr = cj(f, scr)
    sync(f)
    print(f"  fluid compile+first {time.perf_counter() - t0:.0f}s",
          flush=True)
    best = 1e9
    nst = (chunk_steps // (2 * k)) * 2 * k
    for _ in range(repeats):
        t0 = time.perf_counter()
        f, scr = cj(f, scr)
        sync(f)
        best = min(best, time.perf_counter() - t0)
    mlups = n * n * nst / best / 1e6
    print(f"  fluid {n}^2 k={k} [{storage}]: {best / nst * 1e3:.3f} "
          f"ms/step = {mlups:.0f} MLUPS", flush=True)
    return mlups


def bench_static(n=4096, n_disks=4096, chunk=200, repeats=2):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench as b

    mlups = b._run_static(n, n_disks, chunk, repeats)
    print(f"  static hoist {n}^2/{n_disks}: {mlups:.0f} MLUPS", flush=True)
    return mlups


def bench_coupled(n=4096, n_disks=10000, chunk=100, repeats=3,
                  storage="float32", eps="sample"):
    import bench as b

    mlups = b._run(n, n, n_disks, chunk, repeats, True, storage, eps)
    print(f"  coupled {n}^2/{n_disks} [{storage}/{eps}]: {mlups:.0f} "
          f"MLUPS", flush=True)
    return mlups


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="64x1024,128x1024,256x1024")
    ap.add_argument("--coupled", action="store_true",
                    help="also run the full coupled 4096^2/10k stage")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 f-storage variants")
    ap.add_argument("--skip-static", action="store_true")
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)
    storage = "bfloat16" if args.bf16 else "float32"
    results = {}
    for spec in args.configs.split(","):
        th, tw = (int(t) for t in spec.split("x"))
        set_tiles(th, tw)
        print(f"--- tiles {th}x{tw} ---", flush=True)
        row = {}
        try:
            parity_probe(storage)
        except Exception as e:
            print(f"  parity/compile FAILED: {type(e).__name__}: {e}",
                  flush=True)
            results[spec] = {"error": str(e)}
            continue
        try:
            row["fluid"] = bench_fluid(storage=storage)
        except Exception as e:
            print(f"  fluid FAILED: {type(e).__name__}: {e}", flush=True)
        if not args.skip_static and storage == "float32":
            try:
                row["static"] = bench_static()
            except Exception as e:
                print(f"  static FAILED: {type(e).__name__}: {e}",
                      flush=True)
        if args.coupled:
            try:
                row["coupled"] = bench_coupled(
                    storage=storage, eps="ramp" if args.bf16 else "sample")
            except Exception as e:
                print(f"  coupled FAILED: {type(e).__name__}: {e}",
                      flush=True)
        results[spec] = row
    print("\n=== tile A/B summary (MLUPS) ===", flush=True)
    for spec, row in results.items():
        print(f"{spec}: " + ", ".join(
            f"{k}={v:.0f}" if isinstance(v, float) else f"{k}={v}"
            for k, v in row.items()), flush=True)


if __name__ == "__main__":
    main()
