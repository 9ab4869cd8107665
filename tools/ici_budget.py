"""ICI halo-traffic budget for the sharded paths (SURVEY.md SS5.7/SS7).

Real multi-chip hardware is not available in this environment (one v5e
chip via axon), so ICI performance claims cannot be *measured*; this
tool makes them CONCRETE instead of absent (VERDICT r2 missing #3): it
computes, from first principles and the actual exchange geometry in
parallel/_pallas_step.py / parallel/sharding.py, the bytes each shard
sends per step, the compute time those bytes must hide under, and the
resulting ICI bandwidth demand vs what a v5e link provides.

Model (per step, per shard, 2D ('y','x') mesh of ny_sh x nx_sh chips,
local shard h x w):

- XLA sharded path (width-1 halos, 3 populations/face):
    y faces: 2 * 3 * (w + 2) * B      (after x-extension, corners ride y)
    x faces: 2 * 3 * h * B
- fused-Pallas prehalo path (pre-collision halos at DMA granularity,
  all 9 populations):
    y faces: 2 * 9 * hy * w * B       (hy = 8 f32 rows / 16 bf16 rows)
    x faces: 2 * 9 * 128 * (h + 2*hy) * B
  Temporal blocking (pure fluid) amortizes ONE exchange over k steps.
- coupled extras: the hydro-force psum moves 3 * max_disks * 4 B in a
  log-tree over the mesh (negligible next to halos for <= 100k disks).

Bandwidth reference: one TPU v5e chip has 4 ICI links x ~400 Gbit/s
(~50 GB/s) per direction; a 2D-mesh neighbor exchange uses 1 link per
face, so the per-face budget is ~45 GB/s sustained (headline numbers,
not measured here - that is the point of this table).

Usage:
    python tools/ici_budget.py               # the standard table
    python tools/ici_budget.py --ny 8192 --nx 8192 --mesh 4x4
"""

import argparse

V5E_LINK_GBS = 45.0  # sustainable GB/s per face direction (headline)


def xla_bytes(h, w, B):
    return 2 * 3 * (w + 2) * B, 2 * 3 * h * B


def pallas_bytes(h, w, B, hy, two_d):
    y = 2 * 9 * hy * w * B
    x = 2 * 9 * 128 * (h + 2 * hy) * B if two_d else 0
    return y, x


def row(name, ny, nx, mesh, storage="float32", temporal_k=1,
        mlups_chip=2000.0):
    ny_sh, nx_sh = mesh
    h, w = ny // ny_sh, nx // nx_sh
    B = 2 if storage == "bfloat16" else 4
    hy = 16 if storage == "bfloat16" else 8
    yb, xb = pallas_bytes(h, w, B, hy, nx_sh > 1)
    per_step = (yb + xb) / temporal_k
    # compute time the exchange must hide under: the shard's update
    # time at the single-chip rate (the kernel overlaps DMA with
    # compute, and the ppermute sits between kernel launches)
    step_s = (h * w) / (mlups_chip * 1e6) / temporal_k
    need_gbs = per_step / step_s / 1e9 if step_s else float("inf")
    frac = need_gbs / V5E_LINK_GBS
    print(f"{name:<44} {h}x{w:<6} {per_step/1024:8.0f} KiB "
          f"{step_s*1e3:7.3f} ms {need_gbs:7.2f} GB/s {frac:6.1%}")
    return frac


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ny", type=int, default=4096)
    ap.add_argument("--nx", type=int, default=4096)
    ap.add_argument("--mesh", default="2x2")
    ap.add_argument("--mlups", type=float, default=2000.0,
                    help="per-chip MLUPS to hide the exchange under "
                         "(bench.py's measured single-chip rate)")
    args = ap.parse_args(argv)
    ny_sh, nx_sh = (int(t) for t in args.mesh.split("x"))
    mesh = (ny_sh, nx_sh)
    ny, nx = args.ny, args.nx

    print(f"ICI halo budget: {ny}x{nx} lattice on a {ny_sh}x{nx_sh} mesh, "
          f"hiding under {args.mlups:.0f} MLUPS/chip")
    print(f"{'path':<44} {'shard':<8} {'sent/step':>12} {'step':>10} "
          f"{'need':>10} {'of link':>7}")
    worst = 0.0
    worst = max(worst, row("fused-Pallas f32 (1 exchange/step)",
                           ny, nx, mesh, mlups_chip=args.mlups))
    worst = max(worst, row("fused-Pallas bf16 (16-row granule)",
                           ny, nx, mesh, "bfloat16",
                           mlups_chip=args.mlups))
    worst = max(worst, row("fused-Pallas f32 + temporal k=4 (pure fluid)",
                           ny, nx, mesh, temporal_k=4,
                           mlups_chip=args.mlups))
    worst = max(worst, row("fused-Pallas f32 + temporal k=8",
                           ny, nx, mesh, temporal_k=8,
                           mlups_chip=args.mlups))
    h, w = ny // ny_sh, nx // nx_sh
    yb, xb = xla_bytes(h, w, 8)
    print(f"{'XLA sharded f64 (width-1, 3 pops/face)':<44} {h}x{w:<6} "
          f"{(yb+xb)/1024:8.0f} KiB")
    print()
    if worst < 0.5:
        print(f"verdict: worst case uses {worst:.0%} of one v5e ICI "
              f"link - halo exchange is NOT the bottleneck at this "
              f"geometry; per-chip HBM bandwidth remains the limiter.")
    else:
        print(f"verdict: worst case needs {worst:.0%} of one v5e ICI "
              f"link - shrink shards no further, or raise temporal k.")


if __name__ == "__main__":
    main()
