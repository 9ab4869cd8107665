"""Live-dataflow stage ablation of the coupled Pallas step on TPU.

Measures the MARGINAL cost of each pipeline stage at a given config by
timing jitted fori_loop chunks where one stage is replaced by a cheap
substitute that keeps the dataflow live (every remaining stage still
consumes values derived from the ablated stage's inputs, so XLA cannot
dead-code or loop-hoist the rest of the pipeline — see
docs/performance.md "Measurement pitfalls").

Usage:  python tools/ablate.py [nx] [n_disks] [chunk]
"""

import sys
import time

import jax
import jax.numpy as jnp

from lbmdem_tpu.models import column_collapse
from lbmdem_tpu.ops import dem as dem_ops
from lbmdem_tpu.ops import pallas_dem, pallas_lbm, pallas_stamp
from lbmdem_tpu.simulation import BIN_MARGIN, SimState, Simulation


def build_variants(cfg, grid, axis="y"):
    """dict name -> step(state, lists, counts, entry_slots) -> state.

    The tile lists are passed in (built outside the loop at the Verlet
    cadence in production; their per-step share is measured separately
    by the 'binning' row which rebuilds them every step).
    """
    n = cfg.max_disks

    def tiny(x):
        return x.astype(jnp.float32) * jnp.float32(1e-30)

    def assemble(do_bin, do_stamp, do_lbm, do_reduce, dem_kind,
                 do_gather=True):
        def step(state, lists, counts, entry_slots):
            d = state.disks
            if do_lbm == "floor":
                # minimal live step: one f pass + disk touch = the
                # irreducible fori/donation/traffic floor. 1e-30 is
                # representable in bf16 (8-bit exponent), so the add
                # stays live under ABLATE_F_STORAGE=bfloat16 too.
                return state._replace(
                    f=state.f + jnp.asarray(1e-30, state.f.dtype),
                    disks=d._replace(x=d.x + tiny(d.v).astype(d.x.dtype)),
                    step=state.step + 1,
                )
            if do_bin:
                lists, counts, entry_slots, _ = pallas_stamp.build_tile_lists(
                    d.x, d.active, cfg, margin=BIN_MARGIN
                )
            if do_gather:
                tile_data = pallas_stamp.gather_tile_data(
                    lists, d.x, d.v, d.omega, d.r, d.active
                )
            else:
                n_tiles, cap = lists.shape
                tile_data = jnp.zeros(
                    (n_tiles, 1, cap * 8), jnp.float32
                ) + jnp.sum(tiny(d.x)) + jnp.sum(tiny(lists))
            if do_stamp:
                eps, usx, usy, _ = pallas_stamp.stamp_solid_fraction(
                    d.x, d.v, d.omega, d.r, d.active, cfg,
                    binned=(tile_data, counts, None, None),
                )
            else:
                live = jnp.sum(tiny(tile_data))
                eps = jnp.zeros((cfg.ny, cfg.nx), jnp.float32) + live
                usx = eps
                usy = eps
            if do_lbm == "fused":
                # production path: IMB + in-kernel hydro reduction
                fnew, partials = pallas_lbm.fused_step_imb_reduce(
                    state.f, eps, usx, usy, cfg, tile_data, counts
                )
                fh, th = pallas_stamp.gather_partials(
                    partials, entry_slots, d.x.dtype
                )
                disks, ovf, nc = pallas_dem.dem_subcycle(
                    d, fh, th, grid, cfg, axis
                )
                return state._replace(
                    f=fnew, disks=disks, step=state.step + 1,
                    overflow=jnp.maximum(state.overflow, ovf), n_contacts=nc,
                )
            if do_lbm:
                fnew, phix, phiy = pallas_lbm.fused_step_imb(
                    state.f, eps, usx, usy, cfg
                )
            else:
                fnew = (state.f + (tiny(eps)[None] + tiny(usx) +
                                   tiny(usy)).astype(state.f.dtype))
                phix = tiny(state.f[0]) + tiny(eps)
                phiy = phix
            if do_reduce:
                fh, th = pallas_stamp.reduce_hydro_forces(
                    d.x, d.r, d.active, eps, phix, phiy, cfg,
                    tile_data, counts, entry_slots,
                )
            else:
                live = jnp.zeros((n,), jnp.float32) + jnp.sum(
                    tiny(phix[0]) + tiny(phiy[0]) + tiny(eps[0])
                )
                fh = jnp.stack([live, live], 1).astype(d.x.dtype)
                th = live.astype(d.x.dtype)
            if dem_kind == "slab":
                disks, ovf, nc = pallas_dem.dem_subcycle(
                    d, fh, th, grid, cfg, axis
                )
            elif dem_kind == "build":
                # build_slabs only: isolates the XLA-side slab build from
                # the kernel + exit gather
                body_f = dem_ops.body_forces(d, cfg)
                slabs, slot, ovf, kmax, n_occ, offs, _ = pallas_dem.build_slabs(
                    d, fh, th, body_f, grid, axis
                )
                live = tiny(slabs[0, 0, 0, :2].sum()) + tiny(slot[0]) + tiny(kmax)
                disks = d._replace(
                    x=d.x + tiny(fh).astype(d.x.dtype) + live.astype(d.x.dtype),
                    v=d.v + tiny(fh).astype(d.x.dtype),
                )
                nc = state.n_contacts
            elif dem_kind == "xla":
                disks, ovf, nc = dem_ops.dem_subcycle(d, fh, th, grid, cfg)
            else:  # ablated: advance positions by a live function of fh
                disks = d._replace(
                    x=d.x + tiny(fh).astype(d.x.dtype),
                    v=d.v + tiny(fh).astype(d.x.dtype),
                )
                ovf = state.overflow
                nc = state.n_contacts
            return state._replace(
                f=fnew, disks=disks, step=state.step + 1,
                overflow=jnp.maximum(state.overflow, ovf), n_contacts=nc,
            )

        return step

    def assemble_fused(do_bin, do_stamp, do_reduce, dem_kind,
                       do_gather=True):
        """Stage decomposition around fused_step_imb_reduce (the
        production kernel for bf16 storage, where the split
        fused_step_imb + reduce_hydro_forces pair does not exist):
        the stamp ablates via zeroed eps/us inputs, the in-kernel
        reduce ablates via ZEROED COUNTS (its per-tile loops are
        traced-trip-count fori_loops - zero trips skip the work but
        keep the partials output live through the DEM)."""

        def step(state, lists, counts, entry_slots):
            d = state.disks
            if do_bin:
                lists, counts, entry_slots, _ = pallas_stamp.build_tile_lists(
                    d.x, d.active, cfg, margin=BIN_MARGIN
                )
            if do_gather:
                tile_data = pallas_stamp.gather_tile_data(
                    lists, d.x, d.v, d.omega, d.r, d.active
                )
            else:
                n_tiles, cap = lists.shape
                tile_data = jnp.zeros(
                    (n_tiles, 1, cap * 8), jnp.float32
                ) + jnp.sum(tiny(d.x)) + jnp.sum(tiny(lists))
            if do_stamp:
                eps, usx, usy, _ = pallas_stamp.stamp_solid_fraction(
                    d.x, d.v, d.omega, d.r, d.active, cfg,
                    binned=(tile_data, counts, None, None),
                )
            else:
                live = jnp.sum(tiny(tile_data))
                eps = jnp.zeros((cfg.ny, cfg.nx), jnp.float32) + live
                usx = eps
                usy = eps
            rcounts = counts if do_reduce else jnp.zeros_like(counts)
            fnew, partials = pallas_lbm.fused_step_imb_reduce(
                state.f, eps, usx, usy, cfg, tile_data, rcounts
            )
            fh, th = pallas_stamp.gather_partials(
                partials, entry_slots, d.x.dtype
            )
            if dem_kind == "slab":
                disks, ovf, nc = pallas_dem.dem_subcycle(
                    d, fh, th, grid, cfg, axis
                )
            elif dem_kind == "xla":
                disks, ovf, nc = dem_ops.dem_subcycle(d, fh, th, grid, cfg)
            else:
                disks = d._replace(
                    x=d.x + tiny(fh).astype(d.x.dtype),
                    v=d.v + tiny(fh).astype(d.x.dtype),
                )
                ovf = state.overflow
                nc = state.n_contacts
            return state._replace(
                f=fnew, disks=disks, step=state.step + 1,
                overflow=jnp.maximum(state.overflow, ovf), n_contacts=nc,
            )

        return step

    def assemble_window(ck, do_bin, do_stamp, do_reduce, dem_kind,
                        do_gather=True):
        """Stage decomposition of the coupling-cadence WINDOW step
        (cfg.coupling_k = ck: fused_step_imb_reduce_multi + the
        window-persistent slim-slab DEM), mirroring simulation.py's
        coupling path. The reduce ablates via zeroed counts exactly
        like assemble_fused (traced-trip-count loops, all k inner
        steps); the DEM ablates to a live function of ALL k force
        gathers so the per-inner-step gather chain stays."""

        def step(state, lists, counts, entry_slots):
            d = state.disks
            if do_bin:
                lists, counts, entry_slots, _ = (
                    pallas_stamp.build_tile_lists(
                        d.x, d.active, cfg, margin=BIN_MARGIN
                    )
                )
            if do_gather:
                tile_data = pallas_stamp.gather_tile_data(
                    lists, d.x, d.v, d.omega, d.r, d.active
                )
            else:
                n_tiles, cap = lists.shape
                tile_data = jnp.zeros(
                    (n_tiles, 1, cap * 8), jnp.float32
                ) + jnp.sum(tiny(d.x)) + jnp.sum(tiny(lists))
            if do_stamp:
                solid, _ = pallas_stamp.stamp_solid_fraction(
                    d.x, d.v, d.omega, d.r, d.active, cfg,
                    binned=(tile_data, counts, None, None), as_stack=True,
                )
            else:
                live = jnp.sum(tiny(tile_data))
                solid = jnp.zeros((3, cfg.ny, cfg.nx), jnp.float32) + live
            rcounts = counts if do_reduce else jnp.zeros_like(counts)
            fnew, parts = pallas_lbm.fused_step_imb_reduce_multi(
                state.f, solid, cfg, ck, tile_data, rcounts
            )
            forces = []
            for t in range(ck):
                fh, tq = pallas_stamp.gather_partials(
                    parts[t], entry_slots, d.x.dtype
                )
                forces.append((fh, tq))
            if dem_kind == "slab":
                disks, ovf, nc = pallas_dem.dem_subcycle_window(
                    d, forces, grid, cfg, axis
                )
            else:
                acc = forces[0][0]
                for fh, _ in forces[1:]:
                    acc = acc + fh
                disks = d._replace(
                    x=d.x + tiny(acc).astype(d.x.dtype),
                    v=d.v + tiny(acc).astype(d.x.dtype),
                )
                ovf = state.overflow
                nc = state.n_contacts
            return state._replace(
                f=fnew, disks=disks, step=state.step + ck,
                overflow=jnp.maximum(state.overflow, ovf), n_contacts=nc,
            )

        return step

    ck = cfg.coupling_k
    if ck > 1:
        # window-mode marginals (ABLATE_COUPLING_K): "floor" is the one
        # irreducible f pass - compare it to full/ck (one HBM pass per
        # window); main() normalizes the others to per-LBM-step ms
        return {
            "floor": assemble(False, False, "floor", False, None),
            "full": assemble_window(ck, False, True, True, "slab"),
            "full+bin": assemble_window(ck, True, True, True, "slab"),
            "no-stamp": assemble_window(ck, False, False, True, "slab"),
            "no-reduce": assemble_window(ck, False, True, False, "slab"),
            "no-dem": assemble_window(ck, False, True, True, None),
            "no-gather": assemble_window(ck, False, True, True, "slab",
                                         do_gather=False),
        }
    if cfg.f_storage == "bfloat16":
        # marginals vs the fused production step ("full" == "fused"
        # here); "no-lbm" has no bf16 analogue (the LBM IS the kernel)
        return {
            "floor": assemble(False, False, "floor", False, None),
            "fused": assemble_fused(False, True, True, "slab"),
            "full": assemble_fused(False, True, True, "slab"),
            "full+bin": assemble_fused(True, True, True, "slab"),
            "no-stamp": assemble_fused(False, False, True, "slab"),
            "no-reduce": assemble_fused(False, True, False, "slab"),
            "no-dem": assemble_fused(False, True, True, None),
            "no-gather": assemble_fused(False, True, True, "slab",
                                        do_gather=False),
            "xla-dem": assemble_fused(False, True, True, "xla"),
        }
    return {
        "floor": assemble(False, False, "floor", False, None),
        "fused": assemble(False, True, "fused", True, "slab"),
        "full": assemble(False, True, True, True, "slab"),
        "full+bin": assemble(True, True, True, True, "slab"),
        "no-stamp": assemble(False, False, True, True, "slab"),
        "no-lbm": assemble(False, True, False, True, "slab"),
        "no-reduce": assemble(False, True, True, False, "slab"),
        "no-dem": assemble(False, True, True, True, None),
        "no-gather": assemble(False, True, True, True, "slab",
                              do_gather=False),
        "dem-build": assemble(False, True, True, True, "build"),
        "xla-dem": assemble(False, True, True, True, "xla"),
    }


def main():
    import os

    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    nd = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    names = sys.argv[4].split(",") if len(sys.argv) > 4 else None

    cfg, disks = column_collapse(nx=nx, ny=nx, n_disks=nd)
    # ABLATE_EPS / ABLATE_F_STORAGE re-balance the stage marginals for
    # the opt-in tiers (e.g. ABLATE_EPS=ramp after the r3 coverage A/B)
    cfg = cfg.replace(out_interval=10**9,
                      eps_method=os.environ.get("ABLATE_EPS", "sample"),
                      f_storage=os.environ.get("ABLATE_F_STORAGE",
                                               "float32"),
                      coupling_k=int(os.environ.get("ABLATE_COUPLING_K",
                                                    "1")))
    sim = Simulation(cfg, disks, use_pallas=True)
    cfg, grid = sim.cfg, sim.grid
    variants = build_variants(cfg, grid, sim.dem_axis)
    if names:
        variants = {k: variants[k] for k in names}

    d0 = sim.state.disks
    lists, counts, entry_slots, _ = pallas_stamp.build_tile_lists(
        d0.x, d0.active, cfg, margin=BIN_MARGIN
    )
    lists, counts, entry_slots = jax.device_put((lists, counts, entry_slots))

    results = {}
    for name, step in variants.items():
        def chunk_fn(state, _step=step):
            return jax.lax.fori_loop(
                0, chunk,
                lambda _, s: _step(s, lists, counts, entry_slots), state,
            )

        fn = jax.jit(chunk_fn)
        t0 = time.time()
        out = fn(sim.state)
        jax.device_get(out.step)
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            out = fn(out._replace(step=jnp.zeros((), jnp.int32)))
            jax.device_get(out.step)
            best = min(best, time.time() - t0)
        # window mode: each call advances coupling_k LBM steps (floor
        # stays per-pass - one f round-trip, the window's HBM unit)
        spc = cfg.coupling_k if name != "floor" else 1
        ms = best / chunk / spc * 1e3
        results[name] = ms
        print(f"{name:10s} {ms:8.3f} ms/step   (compile {compile_s:.0f}s)",
              flush=True)

    full = results.get("full")
    if full is not None:
        print("\nmarginals vs full (slab DEM, lists prebuilt):")
        for name, ms in results.items():
            if name.startswith("no-"):
                print(f"  {name[3:]:8s} {full - ms:8.3f} ms")
            elif name == "full+bin":
                print(f"  binning  {ms - full:8.3f} ms (per-step rebuild)")
            elif name == "xla-dem":
                print(f"  xla-dem  {ms - full:8.3f} ms (vs slab)")


if __name__ == "__main__":
    main()
