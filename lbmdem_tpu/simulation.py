"""Simulation state + driver (SURVEY.md SS2 C21, SS3 call stacks).

The reference's `main()` time loop (SURVEY SS3.2) becomes a pure jitted
step function over a `SimState` pytree, run in `lax.fori_loop` chunks
between host-side snapshot dumps - the only recurring host crossing,
exactly as SURVEY SS3.2 mandates for the rebuild.

    sim = Simulation(cfg, disks)
    sim.run(cfg.steps)          # chunked by cfg.out_interval
    rho, ux, uy = sim.macroscopic()
"""

from __future__ import annotations

import time
from typing import Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lbmdem_tpu.config import DiskSpec, SimConfig, window_for_radius
from lbmdem_tpu.ops import dem, imb, lbm
from lbmdem_tpu.ops.dem import DemGrid, DiskState


class SimulationDiverged(RuntimeError):
    """Raised by paranoid mode; .step is the first failing step."""

    def __init__(self, msg: str, step: int):
        super().__init__(msg)
        self.step = step


class FluidState(NamedTuple):
    """Fluid-only view (kept for API symmetry with the reference's arrays)."""

    f: jax.Array  # (9, ny, nx)


class SimState(NamedTuple):
    """Full simulation state pytree: everything the step loop touches."""

    f: jax.Array  # (9, ny, nx) distributions
    disks: DiskState
    step: jax.Array  # () int32
    overflow: jax.Array  # () int32, max cell-list overflow seen
    n_contacts: jax.Array  # () int32, contacts at last step
    # () int32: first step whose state failed paranoid validation
    # (-1 = healthy). Only written when cfg.paranoia; once set, the
    # step function freezes the state so the failing fields survive
    # the rest of the fori_loop chunk (SURVEY SS5.2/5.3).
    fail_step: jax.Array = None


def state_ok(cfg: SimConfig, new: SimState):
    """() bool: paranoid validity of `new` (SURVEY SS5.2/5.3): all f
    finite, rho > 0 everywhere, disk state finite, no capacity
    overflow. Works on a shard-local state too (combine shard results
    with lax.pmin before paranoid_commit)."""
    ok = jnp.all(jnp.isfinite(new.f))
    # bf16 storage holds g = f - w*rho0: rho = sum(g) + rho0
    rho = jnp.sum(new.f.astype(jnp.float32), axis=0)
    if cfg.f_storage == "bfloat16":
        rho = rho + cfg.rho0
    ok &= jnp.all(rho > 0.0)
    if cfg.max_disks > 0:
        d = new.disks
        ok &= jnp.all(jnp.isfinite(d.x)) & jnp.all(jnp.isfinite(d.v))
        ok &= jnp.all(jnp.isfinite(d.omega))
    ok &= new.overflow == 0
    return ok


def paranoid_commit(old: SimState, new: SimState, ok) -> SimState:
    """Freeze-on-failure commit: once fail_step is set, every later
    commit is identity (the failing fields survive the rest of the
    chunk for inspection); an `ok=False` commit records new.step as the
    failing step. The freeze is a value-level select, NOT lax.cond: a
    cond around a kernel-bearing step measured a ~27x remote-compile
    blowup on TPU (branch duplication defeats buffer donation), while
    select compiles like the plain step. Post-failure steps waste
    compute, but failure is terminal: the chunk ends anyway."""
    frozen = old.fail_step >= 0
    out = jax.tree.map(
        lambda o, fresh: jnp.where(frozen, o, fresh), old, new
    )
    return out._replace(
        fail_step=jnp.where(
            frozen, old.fail_step,
            jnp.where(ok, jnp.int32(-1), new.step),
        )
    )


def paranoid_wrap(step: Callable, cfg: SimConfig) -> Callable:
    """Per-step in-chunk validation (SURVEY SS5.2/5.3 paranoid mode).

    After each step: state_ok; on the first violation the state freezes
    (the remaining fori_loop iterations become identity), so
    `state.fail_step` reports the exact failing step and the failing
    fields are inspectable - instead of a NaN silently surfacing at the
    next out_interval. cfg.paranoia="chunk" applies the same check at
    kernel-chunk granularity instead (see Simulation._chunk_fn), keeping
    the fast chunk structures.
    """

    def wrapped(state: SimState, f_scratch=None) -> SimState:
        # The step runs UNCONDITIONALLY; freeze semantics and the
        # cond-vs-select rationale live in paranoid_commit.
        new = step(state, f_scratch)
        return paranoid_commit(state, new, state_ok(cfg, new))

    return wrapped


# Verlet-style cadence for the stamp tile lists: rebuilt every
# BIN_CADENCE steps with BIN_MARGIN cells of slack; per-step travel
# beyond the margin is detected and counted in state.overflow.
BIN_CADENCE = 8
BIN_MARGIN = 2

# Pure-fluid temporal blocking: LBM steps evolved per fused-kernel pass
# (bounded by the 8-row halo margin, pallas_lbm._HY). 1 disables.
# TPU A/B at 4096^2 (tools/ab_temporal.py): k=1 2.348 ms/step (7146
# MLUPS), k=4 1.109 (15127), k=8 1.148 (14616) - by k=4 the step is
# compute-bound on the 1.56x halo-overlap recompute, so the extra
# traffic halving at k=8 no longer pays. Re-confirmed r3 SAME-SESSION
# (sessions vary ~10%+ day to day - never compare across clients):
# f32 k=4 19774 vs k=8 19648; bf16 k=4 16710 > k=8 16152 > k=16 13819;
# static-coupled hoist k=4 11652 > k=8 11398 (k=1: 5652). k=4 is the
# right block for every path.
TEMPORAL_K = 4


def pingpong_loop(stepfn, state, scr, m):
    """m applications of stepfn(state, f_scratch) -> state over two
    ping-ponged donated f buffers. THE single definition of the
    donation-ordering dance (single-chip chunks, the static hoist,
    and the sharded chunk bodies in parallel/_pallas_step.py all use
    it): stepfn writes its output f into the scratch buffer via
    input_output_aliases, so after each call the old state.f is dead
    and becomes the NEXT scratch. The loop body is an unrolled DOUBLE
    step - after two steps every while-carry slot holds its original
    allocation again, which is what lets XLA run the fori_loop fully
    in place (a single-step body trips XLA's while in-place rule into
    a full f copy per iteration: 1.2 GB at 4096^2, seen as copy.333
    in the profile, ~1.8 ms/step). An odd remainder step runs OUTSIDE
    the loop. Returns (state, scratch)."""
    m2, rem = divmod(m, 2)
    if m2:

        def dbl(c):
            s1 = stepfn(c[0], c[1])
            s2 = stepfn(s1, c[0].f)
            return (s2, s1.f)

        state, scr = jax.lax.fori_loop(0, m2, lambda _, c: dbl(c),
                                       (state, scr))
    if rem:
        s1 = stepfn(state, scr)
        state, scr = s1, state.f
    return state, scr


def pallas_supported(cfg: SimConfig, mesh=None) -> Optional[str]:
    """None if the fused Pallas path supports `cfg`, else the reason.

    Checked at Simulation construction (use_pallas=True raises a clear
    ValueError instead of a trace-time kernel assert) and by the CLI's
    auto path selection. `cfg` must be the derived config (window set).

    With `mesh`, validates the per-shard geometry the sharded Pallas
    path actually runs on: the local (h, w) frame feeds the lattice
    kernel, and the stamp tiles are chosen on the padded local canvas
    (parallel/_pallas_step.canvas_pads), whose tile divisors can be much
    smaller than the global lattice's."""
    if cfg.dtype != "float32":
        return f"Pallas path is float32-only (dtype={cfg.dtype})"
    if cfg.f_storage == "bfloat16":
        # bf16 VMEM tiles are (16, 128): the halo DMA row granule (and,
        # sharded, the prehalo ppermute exchange) doubles to 16 rows,
        # so the (per-shard) height must be 16-divisible.
        ny_chk = cfg.ny
        if mesh is not None:
            if cfg.ny % mesh.shape["y"]:
                return (
                    f"lattice ny={cfg.ny} does not tile the mesh "
                    f"({mesh.shape['y']} shards)"
                )
            ny_chk = cfg.ny // mesh.shape["y"]
        if ny_chk % 16:
            where = "per-shard ny" if mesh is not None else "ny"
            return (
                f"f_storage='bfloat16' needs {where}%16==0 (16-row bf16 "
                f"DMA granule; got {ny_chk})"
            )
    ny, nx = cfg.ny, cfg.nx
    two_d = False
    if mesh is not None:
        ny_sh, nx_sh = mesh.shape["y"], mesh.shape["x"]
        if cfg.ny % ny_sh or cfg.nx % nx_sh:
            return (
                f"lattice {cfg.ny}x{cfg.nx} does not tile the "
                f"{ny_sh}x{nx_sh} mesh"
            )
        ny, nx = cfg.ny // ny_sh, cfg.nx // nx_sh
        two_d = nx_sh > 1
    if ny % 8 or nx % 128:
        where = "per-shard" if mesh is not None else "lattice"
        return (
            f"fused lattice kernel needs ny%8==0 and nx%128==0 "
            f"({where} {ny}x{nx})"
        )
    if cfg.max_disks > 0:
        margin = 2 * BIN_MARGIN
        if mesh is not None:
            from lbmdem_tpu.parallel._pallas_step import canvas_pads

            # stamp tiles are chosen on the padded local canvas, whose
            # pads align canvas tiles to the interior's stamp sub-tiles
            # (canvas_pads); both the per-step and the Verlet-cadence
            # sharded paths bin on it (the cadence adds the margin)
            pady, padx = canvas_pads(ny, two_d)
            ny += 2 * pady
            nx += 2 * padx
        th = next(t for t in (128, 64, 32, 16, 8, 4, 2, 1) if ny % t == 0)
        tw = next(t for t in (128, 64, 32, 16, 8, 4, 2, 1) if nx % t == 0)
        if cfg.window + margin > min(th, tw):
            canvas = " stamp-canvas" if mesh is not None else ""
            return (
                f"stamp window {cfg.window}"
                + (f" (+{margin} Verlet margin)" if margin else "")
                + f" exceeds the {th}x{tw}{canvas} stamp tile; disks "
                f"too large for this lattice/mesh geometry"
            )
    return None


def make_step_fn(
    cfg: SimConfig, grid: Optional[DemGrid], use_pallas: bool = False,
    tile_lists=None, dem_axis: str = "y", temporal_k: int = 1,
    dem_mode: str = "subcycle", coupling_k: int = 1,
) -> Callable[[SimState], SimState]:
    """Build the fused per-step function (SURVEY SS3.2 rebuilt).

    With disks: eps-stamp -> NT collide(+forcing) -> stream -> bounce-back
    -> hydro force reduction -> DEM subcycle. Without: pure collide-
    stream-BB fast path (SS3.3). `use_pallas` swaps the lattice update
    for the fused Pallas kernel (ops/pallas_lbm.py) where available.

    `tile_lists` = (lists, counts, entry_slots, x_bin, gparent, gaxes)
    lets the caller amortize the stamp binning over several steps (see
    BIN_CADENCE); travel beyond BIN_MARGIN is counted into
    state.overflow. gparent/gaxes are the periodic ghost selection made
    at the same rebuild (None when no axis is periodic): the step
    re-derives ghost COORDS from current parent positions each step,
    but must NOT re-wrap or re-select mid-cadence.

    The returned step takes an optional `f_scratch` (a dead f-shaped
    buffer): on the Pallas paths the kernel output is written into it
    via input_output_aliases, sidestepping XLA's while-carry in-place
    rule that otherwise COPIES the whole f array every step (1.2 GB at
    4096^2). Loop drivers ping-pong two buffers with an unrolled double
    step (see Simulation._chunk_fn) so each carry slot keeps a fixed
    allocation.
    """
    coupled = cfg.max_disks > 0
    periodic_dem = coupled and bool(cfg.wrap_lx or cfg.wrap_ly)
    # Zou/He channels: mobile disks leaving through the open x ends are
    # deactivated once fully outside (dem.cull_open_boundaries)
    open_cull = coupled and cfg.bc_west == "inlet"
    if use_pallas:
        from lbmdem_tpu.ops import pallas_dem, pallas_lbm, pallas_stamp

        use_slab_dem = (
            coupled
            and dem_mode == "subcycle"
            and pallas_dem.slab_supported(grid, dem_axis, kt=cfg.kt > 0.0)
        )

    def advance_disks(d, fh, th):
        # dem_mode "drift" (every disk fixed, e.g. a porous bed or a
        # periodic obstacle array): no contact machinery at all - fixed
        # disks just translate/rotate at their prescribed constant
        # v/omega over the LBM step (dt = 1)
        if dem_mode == "drift":
            nd = d._replace(
                x=d.x + d.v * d.active[:, None],
                theta=d.theta + d.omega * d.active,
            )
            z = jnp.zeros((), jnp.int32)
            return nd, z, z
        return dem.dem_subcycle(d, fh, th, grid, cfg)

    def coupling_inputs(d):
        """Step/window-start coupling inputs, shared by the per-step and
        coupling_k step builders (one copy of the ghost/binning/travel
        invariants - ADVICE r4): wrap + periodic-ghost selection and
        the stamp-tile binning with its BIN_MARGIN travel check.

        Returns (d, (xa, va, oma, ra, acta), binned, bovf, gparent):
        `d` has wrapped positions when this call did a fresh periodic
        selection (with tile_lists the Verlet-cadence driver wrapped at
        the last rebuild - positions must NOT re-wrap mid-cadence, the
        +-L jump would invalidate the persistent lists); the aug tuple
        is the ghost-augmented coupling view; `binned` is (tile_data,
        counts, entry_slots) on the Pallas path, else None."""
        govf = jnp.zeros((), jnp.int32)
        gparent = gaxes = aug = lists = counts = entry_slots = None
        if tile_lists is not None:  # use_pallas only (chunk drivers)
            lists, counts, entry_slots, x_bin, gparent, gaxes = tile_lists
            travel2 = jnp.where(
                d.active, jnp.sum((d.x - x_bin) ** 2, axis=-1), 0.0
            )
            bovf = jnp.sum(
                travel2 > float(BIN_MARGIN) ** 2, dtype=jnp.int32
            )
        else:
            if periodic_dem:
                # wrap positions, then select the disks whose stamp
                # window can cross a periodic seam - their min-image
                # ghost copies feed every coupling path and their hydro
                # forces fold back into the parents
                xw, aug, gparent, gaxes, govf = imb.periodic_ghosts(
                    d.x, d.v, d.omega, d.r, d.active, cfg
                )
                d = d._replace(x=xw)
            bovf = govf
        if not periodic_dem:
            aug5 = (d.x, d.v, d.omega, d.r, d.active)
        elif aug is not None:  # fresh per-call selection above
            aug5 = aug
        else:  # Verlet-cadence: stored selection, current positions
            aug5 = imb.apply_ghosts(
                gparent, gaxes, d.x, d.v, d.omega, d.r, d.active, cfg
            )
        binned = None
        if use_pallas:
            xa, va, oma, ra, acta = aug5
            if lists is None:
                lists, counts, entry_slots, bovf = (
                    pallas_stamp.build_tile_lists(xa, acta, cfg)
                )
                bovf = jnp.maximum(bovf, govf)
            tile_data = pallas_stamp.gather_tile_data(
                lists, xa, va, oma, ra, acta
            )
            binned = (tile_data, counts, entry_slots)
        return d, aug5, binned, bovf, gparent

    if coupled and coupling_k > 1:
        # coupling-cadence temporal blocking (cfg.coupling_k): k LBM
        # steps per fused-kernel pass over FROZEN window-start solid
        # fields; the per-inner-step force reduce feeds k sequential
        # DEM applications, so only the geometry the fluid sees lags
        # (< k steps ~ k*|v| cells). The returned step advances k
        # steps per call (chunk drivers divide their step budget by k;
        # open-boundary culling moves to the window end).
        ck = coupling_k

        def step(state: SimState, f_scratch=None) -> SimState:
            n_real = state.disks.x.shape[0]
            # window-start coupling inputs, frozen for the k inner steps
            d, (xa, va, oma, ra, acta), binned, bovf, gparent = (
                coupling_inputs(state.disks)
            )
            if use_pallas:
                tile_data, counts, entry_slots = binned
                solid, _ = pallas_stamp.stamp_solid_fraction(
                    xa, va, oma, ra, acta, cfg,
                    binned=(tile_data, counts, None, None), as_stack=True,
                )
                if open_cull:
                    solid = solid.at[:, :, 0].set(0.0).at[:, :, -1].set(0.0)
                fnew, parts = pallas_lbm.fused_step_imb_reduce_multi(
                    state.f, solid, cfg, ck, tile_data, counts,
                    out_buf=f_scratch,
                )
                forces = []
                for t in range(ck):
                    fh, tq = pallas_stamp.gather_partials(
                        parts[t], entry_slots, d.x.dtype
                    )
                    if periodic_dem:
                        fh, tq = imb.fold_ghost_forces(fh, tq, gparent,
                                                       n_real)
                    forces.append((fh, tq))
            else:
                # oracle of the SAME windowed semantics (parity target
                # for the kernel; storage converts at window boundaries
                # only, matching the in-kernel f32 planes)
                eps, usx, usy = imb.stamp_solid_fraction(
                    xa, va, oma, ra, acta, cfg
                )
                if open_cull:
                    eps, usx, usy = imb.mask_open_columns(eps, usx, usy)
                fs = lbm.from_storage(state.f, cfg)
                forces = []
                for t in range(ck):
                    fpost, phix, phiy = imb.collide_imb(fs, eps, usx, usy,
                                                        cfg)
                    fs = lbm.apply_open_boundaries(
                        lbm.apply_bounce_back(lbm.stream(fpost), fpost,
                                              cfg), cfg
                    )
                    fh, tq = imb.reduce_hydro_forces(
                        xa, ra, acta, eps, phix, phiy, cfg
                    )
                    if periodic_dem:
                        fh, tq = imb.fold_ghost_forces(fh, tq, gparent,
                                                       n_real)
                    forces.append((fh, tq))
                fnew = lbm.to_storage(fs, cfg)
            ovf = bovf
            if use_pallas and use_slab_dem:
                # window-persistent slabs: ONE build + ONE unslab for
                # the k sequential subcycles (only the force channels
                # re-scatter between chained kernel calls)
                dd, ovf_t, nc = pallas_dem.dem_subcycle_window(
                    d, forces, grid, cfg, dem_axis
                )
                ovf = jnp.maximum(ovf, ovf_t)
            else:
                dd = d
                nc = state.n_contacts
                for t in range(ck):
                    dd, ovf_t, nc = advance_disks(dd, forces[t][0],
                                                  forces[t][1])
                    ovf = jnp.maximum(ovf, ovf_t)
            if open_cull:
                dd = dem.cull_open_boundaries(dd, cfg)
            return SimState(
                f=fnew,
                disks=dd,
                step=state.step + ck,
                overflow=jnp.maximum(state.overflow, ovf),
                n_contacts=nc,
                fail_step=state.fail_step,
            )

        if cfg.paranoia:
            step = paranoid_wrap(step, cfg)
        return step

    def step(state: SimState, f_scratch=None) -> SimState:
        if coupled:
            n_real = state.disks.x.shape[0]
            d, (xa, va, oma, ra, acta), binned, bovf, gparent = (
                coupling_inputs(state.disks)
            )
            if use_pallas:
                tile_data, counts, entry_slots = binned
                solid, _ = pallas_stamp.stamp_solid_fraction(
                    xa, va, oma, ra, acta, cfg,
                    binned=(tile_data, counts, None, None), as_stack=True,
                )
                if open_cull:
                    # Zou/He boundary columns must stay pure fluid (see
                    # imb.mask_open_columns); solid is (3, ny, nx)
                    solid = solid.at[:, :, 0].set(0.0).at[:, :, -1].set(0.0)
                # IMB collide-stream with the hydro reduction fused in:
                # phi never round-trips HBM (one less kernel pass); the
                # stamp's stacked fields pass straight through (no
                # 3-plane re-stack copy)
                fnew, partials = pallas_lbm.fused_step_imb_reduce(
                    state.f, solid, None, None, cfg, tile_data, counts,
                    out_buf=f_scratch,
                )
                fh, th = pallas_stamp.gather_partials(
                    partials, entry_slots, d.x.dtype
                )
                if periodic_dem:
                    fh, th = imb.fold_ghost_forces(fh, th, gparent, n_real)
                if use_slab_dem:
                    disks, ovf, nc = pallas_dem.dem_subcycle(
                        d, fh, th, grid, cfg, dem_axis
                    )
                    if open_cull:
                        disks = dem.cull_open_boundaries(disks, cfg)
                    return SimState(
                        f=fnew,
                        disks=disks,
                        step=state.step + 1,
                        overflow=jnp.maximum(
                            state.overflow, jnp.maximum(ovf, bovf)
                        ),
                        n_contacts=nc,
                        fail_step=state.fail_step,
                    )
            else:
                eps, usx, usy = imb.stamp_solid_fraction(
                    xa, va, oma, ra, acta, cfg
                )
                if open_cull:
                    eps, usx, usy = imb.mask_open_columns(eps, usx, usy)
                # oracle path emulates bf16 storage by round-tripping
                # (physical compute between quantized states)
                f_phys = lbm.from_storage(state.f, cfg)
                fpost, phix, phiy = imb.collide_imb(f_phys, eps, usx, usy, cfg)
                fnew = lbm.stream(fpost)
                fnew = lbm.to_storage(
                    lbm.apply_open_boundaries(
                        lbm.apply_bounce_back(fnew, fpost, cfg), cfg
                    ),
                    cfg,
                )
                fh, th = imb.reduce_hydro_forces(
                    xa, ra, acta, eps, phix, phiy, cfg
                )
                if periodic_dem:
                    fh, th = imb.fold_ghost_forces(fh, th, gparent, n_real)
            disks, ovf, nc = advance_disks(d, fh, th)
            if open_cull:
                disks = dem.cull_open_boundaries(disks, cfg)
            return SimState(
                f=fnew,
                disks=disks,
                step=state.step + 1,
                overflow=jnp.maximum(state.overflow, jnp.maximum(ovf, bovf)),
                n_contacts=nc,
                fail_step=state.fail_step,
            )
        else:
            if use_pallas:
                if temporal_k > 1:
                    # temporal blocking: k steps per HBM round-trip
                    # (pallas_lbm.fused_step_fluid_multi); paranoid mode
                    # then validates at k-step granularity
                    fnew = pallas_lbm.fused_step_fluid_multi(
                        state.f, cfg, temporal_k, out_buf=f_scratch
                    )
                    return state._replace(f=fnew, step=state.step + temporal_k)
                fnew = pallas_lbm.fused_step_fluid(state.f, cfg,
                                                   out_buf=f_scratch)
            else:
                fnew = lbm.to_storage(
                    lbm.step_pure_fluid(lbm.from_storage(state.f, cfg), cfg),
                    cfg,
                )
            return state._replace(f=fnew, step=state.step + 1)

    if cfg.paranoia:
        step = paranoid_wrap(step, cfg)
    return step


class Simulation:
    """User-facing driver (C21): owns config, state and the jitted loops."""

    def __init__(
        self,
        cfg: SimConfig,
        disks: Sequence[DiskSpec] = (),
        use_pallas: bool = False,
        mesh=None,
    ):
        """`mesh` (a jax.sharding.Mesh with axes ('y','x'), e.g. from
        parallel.make_mesh) shards the lattice spatially over the mesh
        devices and replicates disks with force-psum - the run()/step()
        API is unchanged (SURVEY SS5.7/5.8)."""
        disks = list(disks)
        if disks:
            r_max = max(d.r for d in disks)
            if cfg.window <= 0:
                cfg = cfg.replace(window=window_for_radius(r_max))
            if cfg.max_disks < len(disks):
                cfg = cfg.replace(max_disks=len(disks))
            self.grid = DemGrid.build(cfg, r_max)
        elif cfg.max_disks > 0:
            self.grid = DemGrid.build(cfg, 1.0)
            if cfg.window <= 0:
                cfg = cfg.replace(window=window_for_radius(1.0))
        else:
            self.grid = None
        if use_pallas and disks and cfg.tile_cap <= 0:
            from lbmdem_tpu.ops import pallas_stamp

            th, tw = pallas_stamp.tile_dims(cfg)
            r_min = min(d.r for d in disks)
            cfg = cfg.replace(
                tile_cap=pallas_stamp.default_tile_cap(
                    th, tw, r_min, cfg.window + 2 * BIN_MARGIN
                )
            )
        cfg.validate_periodic_dem()
        if (cfg.max_disks > 0 and (cfg.wrap_lx or cfg.wrap_ly)
                and cfg.ghost_cap <= 0):
            cfg = cfg.replace(ghost_cap=imb.default_ghost_cap(
                cfg.max_disks, cfg, BIN_MARGIN
            ))
        if use_pallas:
            reason = pallas_supported(cfg, mesh)
            if reason is not None:
                raise ValueError(f"use_pallas=True unsupported: {reason}")
        if cfg.coupling_k > 1 and cfg.max_disks > 0:
            # coupling-cadence temporal blocking is a fused-kernel chunk
            # structure: run() engages it per BIN_CADENCE block;
            # step() stays exact per-step coupling
            if not use_pallas:
                raise ValueError(
                    "coupling_k > 1 needs use_pallas=True (it is a fused-"
                    "kernel chunk structure; the oracle windowed step "
                    "exists for parity testing via make_step_fn only)"
                )
            if cfg.paranoia_mode == "step":
                raise ValueError(
                    "coupling_k > 1 conflicts with paranoia='step' "
                    "(per-step validation forces per-step coupling); "
                    "use paranoia='chunk'"
                )
            if BIN_CADENCE % cfg.coupling_k:
                raise ValueError(
                    f"coupling_k {cfg.coupling_k} must divide the "
                    f"binning cadence ({BIN_CADENCE})"
                )
        if mesh is not None and cfg.f_storage != "float32" and not use_pallas:
            # Only the sharded Pallas paths handle shifted bf16 storage
            # (16-row prehalo exchange + in-kernel shift + storage-aware
            # edge fixups); the XLA sharded step consumes state.f raw.
            raise ValueError(
                "f_storage='bfloat16' on a mesh needs use_pallas=True "
                "(the sharded XLA step consumes raw f32 f)"
            )
        self.cfg = cfg
        self.use_pallas = use_pallas
        self.mesh = mesh
        # slab-DEM plane orientation: band the sparser lattice axis
        # (static per compiled program; see pallas_dem.choose_axis)
        from lbmdem_tpu.ops import pallas_dem

        self.dem_axis = pallas_dem.choose_axis(disks, cfg)
        # every disk fixed -> no contact mechanics at all: positions
        # just drift at the prescribed v/omega (obstacle arrays, beds)
        self.dem_mode = (
            "drift" if disks and all(d.fixed for d in disks) else "subcycle"
        )
        # every disk fixed AND at rest -> the whole coupling input
        # (binning, stamp, solid fields) is a step-invariant CONSTANT:
        # the chunk driver hoists it out of the loop and the step
        # reduces to the fused IMB kernel alone (docs/performance.md
        # Roadmap #1). Computed once, passed as jit ARGUMENTS (captured
        # constants land in the remote-compile request body - HTTP 413
        # at 8192^2-class solid stacks).
        self.static_solid = (
            self.dem_mode == "drift"
            and all(d.vx == 0.0 and d.vy == 0.0 and d.omega == 0.0
                    for d in disks)
        )
        self._static_ops = None
        self.state = SimState(
            f=lbm.to_storage(lbm.init_equilibrium(cfg), cfg),
            disks=dem.make_disk_state(disks, cfg),
            step=jnp.zeros((), jnp.int32),
            overflow=jnp.zeros((), jnp.int32),
            n_contacts=jnp.zeros((), jnp.int32),
            fail_step=jnp.full((), -1, jnp.int32),
        )
        if mesh is not None:
            from lbmdem_tpu.parallel import make_sharded_step, shard_state

            self._step = make_sharded_step(cfg, self.grid, mesh, use_pallas,
                                           dem_axis=self.dem_axis)
            self.state = shard_state(self.state, mesh)
        else:
            self._step = make_step_fn(cfg, self.grid, use_pallas,
                                      dem_axis=self.dem_axis,
                                      dem_mode=self.dem_mode)
        self._chunk_cache = {}
        self.mlups_last = 0.0

    # --- stepping ---
    def step(self) -> None:
        self.state = jax.jit(self._step, donate_argnums=0)(self.state)

    def _chunk_fn(self, n: int):
        # Pallas chunks ping-pong two f buffers with an unrolled DOUBLE
        # step: each kernel writes its output into the other buffer via
        # input_output_aliases (make_step_fn's f_scratch), and after two
        # steps every while-carry slot holds its original allocation
        # again - XLA's while in-place rule otherwise inserts a full f
        # copy (1.2 GB at 4096^2) every iteration (seen as copy.333 in
        # the profile, ~1.8 ms/step).
        if n not in self._chunk_cache:
            step = self._step

            if (self.use_pallas and self.cfg.max_disks > 0
                    and self.mesh is None and self.static_solid
                    and self.cfg.paranoia_mode != "step"):
                # static-solid hoist: all disks fixed at rest, so the
                # binning + stamp are loop constants (built once in
                # _static_solid_operands) and the hydro reduce is
                # skipped entirely (drag on obstacles stays observable
                # through Simulation.hydro_forces at dump time). With
                # the solid fields constant, the coupled step temporal-
                # blocks exactly like pure fluid: k steps per HBM
                # round-trip (fused_step_imb_static_multi - the solid
                # window never decays, only f consumes the cone).
                from lbmdem_tpu.ops import pallas_lbm

                cfg = self.cfg
                kblk = TEMPORAL_K if n >= TEMPORAL_K > 1 else 1
                par_chunk = cfg.paranoia_mode == "chunk"

                def sstep(st, scr, solid, k):
                    fnew = pallas_lbm.fused_step_imb_static_multi(
                        st.f, solid, cfg, k, out_buf=scr
                    )
                    new = st._replace(f=fnew, step=st.step + k)
                    if par_chunk:
                        # paranoia="chunk": validate at the kernel
                        # boundary (every k steps) - the hoist survives,
                        # fail_step reports the block-end step
                        new = paranoid_commit(st, new, state_ok(cfg, new))
                    return new

                def chunk(state, solid):
                    nk, tail = divmod(n, kblk)
                    st, scr = pingpong_loop(
                        lambda s, sc: sstep(s, sc, solid, kblk),
                        state, jnp.zeros_like(state.f), nk,
                    )
                    if tail:
                        st, _ = pingpong_loop(
                            lambda s, sc: sstep(s, sc, solid, 1),
                            st, scr, tail,
                        )
                    return st

                jitted = jax.jit(chunk, donate_argnums=0)
                ops = self._static_solid_operands()
                self._chunk_cache[n] = lambda state: jitted(state, *ops)
                return self._chunk_cache[n]
            if (self.use_pallas and self.cfg.max_disks > 0
                    and self.mesh is not None and self.static_solid
                    and self.cfg.paranoia_mode != "step"):
                # static-solid hoist, mesh edition: a one-time prep
                # shard_map turns the replicated disk state into
                # SHARDED loop constants (per-shard canvas stamp +
                # interior binning), and each step is the fused IMB
                # kernel + edge fixups - no binning/stamp/psum.
                from lbmdem_tpu.parallel._pallas_step import (
                    make_sharded_static_chunk,
                )

                if self._static_ops is None:
                    ny_sh = self.mesh.shape["y"]
                    nx_sh = self.mesh.shape["x"]
                    prep, factory = make_sharded_static_chunk(
                        self.cfg, self.grid, self.mesh,
                        self.cfg.ny // ny_sh, self.cfg.nx // nx_sh,
                        dem_axis=self.dem_axis,
                    )
                    ops, ovf = jax.jit(prep)(self.state)
                    if int(ovf) != 0:
                        raise ValueError(
                            "static-solid binning overflow: raise "
                            "cfg.tile_cap (or cfg.ghost_cap)"
                        )
                    self._static_ops = (ops, factory)
                ops, factory = self._static_ops
                jitted = jax.jit(factory(n), donate_argnums=0)
                self._chunk_cache[n] = lambda state: jitted(state, *ops)
                return self._chunk_cache[n]
            if (self.use_pallas and self.cfg.max_disks > 0
                    and self.mesh is not None
                    and self.cfg.paranoia_mode != "step"):
                # sharded Verlet-cadence chunk: the whole cadence loop
                # (rebuild every BIN_CADENCE steps, margin-validated)
                # lives inside shard_map - same structure as the
                # single-chip branch below (parallel/_pallas_step.py).
                # Paranoid mode needs per-step validation at the
                # shard_map boundary, so it keeps the per-step path.
                from lbmdem_tpu.parallel._pallas_step import (
                    make_sharded_coupled_chunk,
                )

                ny_sh = self.mesh.shape["y"]
                nx_sh = self.mesh.shape["x"]
                chunk = make_sharded_coupled_chunk(
                    self.cfg, self.grid, self.mesh,
                    self.cfg.ny // ny_sh, self.cfg.nx // nx_sh, n,
                    dem_axis=self.dem_axis,
                )
            elif self.use_pallas and self.cfg.max_disks > 0 and self.mesh is None:
                # Verlet-cadence chunk: rebuild the stamp tile lists every
                # BIN_CADENCE steps (margin-validated), amortizing the
                # sort/scatter binning cost.
                from lbmdem_tpu.ops import pallas_stamp

                cfg, grid = self.cfg, self.grid
                n_outer, n_rem = divmod(n, BIN_CADENCE)

                periodic = bool(cfg.wrap_lx or cfg.wrap_ly)
                # paranoia="chunk": validate once per cadence block
                # instead of per step (the inner steps run unwrapped)
                par_chunk = cfg.paranoia_mode == "chunk"
                step_cfg = cfg.replace(paranoia=False) if par_chunk else cfg

                def k_steps(carry, k):
                    st, scr = carry
                    st_in = st
                    d = st.disks
                    gparent = gaxes = None
                    if periodic:
                        # wrap + ghost-select ONLY at rebuild points:
                        # the ghost threshold carries the same
                        # BIN_MARGIN slack as the tile lists, and the
                        # existing travel check flags violations
                        xw, (xb, _, _, _, actb), gparent, gaxes, govf = (
                            imb.periodic_ghosts(
                                d.x, d.v, d.omega, d.r, d.active, cfg,
                                margin=BIN_MARGIN,
                            )
                        )
                        d = d._replace(x=xw)
                        st = st._replace(
                            disks=d,
                            overflow=jnp.maximum(st.overflow, govf),
                        )
                    else:
                        xb, actb = d.x, d.active
                    lists, counts, entry_slots, bovf = (
                        pallas_stamp.build_tile_lists(
                            xb, actb, cfg, margin=BIN_MARGIN
                        )
                    )
                    st = st._replace(overflow=jnp.maximum(st.overflow, bovf))
                    tl = (lists, counts, entry_slots, d.x, gparent, gaxes)
                    ck = cfg.coupling_k
                    # odd k only in the trailing (outside-while) call
                    if ck > 1:
                        # coupling-cadence temporal blocking: k//ck fused
                        # windows (frozen solid fields, per-inner-step
                        # forces), per-step remainder
                        nwin, rem = divmod(k, ck)
                        if nwin:
                            wstep = make_step_fn(
                                step_cfg, grid, True, tile_lists=tl,
                                dem_axis=self.dem_axis,
                                dem_mode=self.dem_mode, coupling_k=ck,
                            )
                            st, scr = pingpong_loop(wstep, st, scr, nwin)
                        if rem:
                            kstep = make_step_fn(
                                step_cfg, grid, True, tile_lists=tl,
                                dem_axis=self.dem_axis,
                                dem_mode=self.dem_mode,
                            )
                            st, scr = pingpong_loop(kstep, st, scr, rem)
                    else:
                        kstep = make_step_fn(
                            step_cfg, grid, True, tile_lists=tl,
                            dem_axis=self.dem_axis,
                            dem_mode=self.dem_mode,
                        )
                        st, scr = pingpong_loop(kstep, st, scr, k)
                    if par_chunk:
                        st = paranoid_commit(st_in, st, state_ok(cfg, st))
                    return st, scr

                def chunk(state):
                    carry = (state, jnp.zeros_like(state.f))
                    if n_outer:
                        carry = jax.lax.fori_loop(
                            0, n_outer,
                            lambda _, c: k_steps(c, BIN_CADENCE), carry,
                        )
                    if n_rem:
                        carry = k_steps(carry, n_rem)
                    return carry[0]
            elif (self.use_pallas and self.cfg.max_disks == 0
                  and n >= TEMPORAL_K > 1):
                # pure fluid: temporal blocking - k steps per kernel
                # pass / HBM round-trip (the halo window's 8-row margin
                # covers k <= 8 steps of the dependency cone; on a mesh
                # the ppermute halo exchange amortizes k-fold too).
                # Bulk in k-step macros, remainder in singles; both
                # ping-pong the two f buffers.
                k = TEMPORAL_K
                if self.mesh is not None:
                    from lbmdem_tpu.parallel import make_sharded_step

                    kstep = make_sharded_step(self.cfg, self.grid, self.mesh,
                                              True, temporal_k=k)
                else:
                    kstep = make_step_fn(self.cfg, None, True, temporal_k=k)

                def chunk(state):
                    nk, tail = divmod(n, k)
                    st, scr = pingpong_loop(kstep, state,
                                            jnp.zeros_like(state.f), nk)
                    st, _ = pingpong_loop(step, st, scr, tail)
                    return st
            elif self.use_pallas:
                # sharded Pallas path, or pure fluid below the temporal
                # block length (the sharded step takes f_scratch too and
                # per-shard-aliases it)

                def chunk(state):
                    st, _ = pingpong_loop(step, state,
                                          jnp.zeros_like(state.f), n)
                    return st
            else:

                def chunk(state):
                    return jax.lax.fori_loop(0, n, lambda _, s: step(s), state)

            self._chunk_cache[n] = jax.jit(chunk, donate_argnums=0)
        return self._chunk_cache[n]

    def _static_solid_operands(self):
        """(solid stack,) for the static-solid hoist: computed once on
        device from the (immutable) disk state and passed as a jit
        ARGUMENT to the hoisted chunk. The hydro reduce is absent from
        that chunk by design - the per-disk force partials of a
        fixed-at-rest scene are never consumed by motion
        (hydro_forces() observes drag from a separate oracle
        evaluation). Binning overflow is checked once here instead of
        per step."""
        if self._static_ops is None:
            from lbmdem_tpu.ops import pallas_stamp

            cfg = self.cfg
            periodic = bool(cfg.wrap_lx or cfg.wrap_ly)

            @jax.jit
            def build(d):
                x, v, om, r, act = d.x, d.v, d.omega, d.r, d.active
                govf = jnp.zeros((), jnp.int32)
                if periodic:
                    _, (x, v, om, r, act), _, _, govf = imb.periodic_ghosts(
                        x, v, om, r, act, cfg
                    )
                binned = pallas_stamp.bin_disks_to_tiles(x, v, om, r, act,
                                                         cfg)
                _, _, _, bovf = binned
                solid, _ = pallas_stamp.stamp_solid_fraction(
                    x, v, om, r, act, cfg, binned=binned, as_stack=True
                )
                if cfg.bc_west == "inlet":
                    # Zou/He boundary columns stay pure fluid (oracle:
                    # imb.mask_open_columns)
                    solid = solid.at[:, :, 0].set(0.0).at[:, :, -1].set(0.0)
                return solid, jnp.maximum(bovf, govf)

            solid, ovf = build(self.state.disks)
            if int(ovf) != 0:
                raise ValueError(
                    "static-solid binning overflow: raise cfg.tile_cap "
                    "(or cfg.ghost_cap for periodic obstacle arrays)"
                )
            self._static_ops = (solid,)
        return self._static_ops

    def run(
        self,
        steps: Optional[int] = None,
        callback: Optional[Callable[["Simulation"], None]] = None,
    ) -> float:
        """Run `steps` LBM steps (default cfg.steps), invoking `callback`
        every cfg.out_interval steps. Returns achieved MLUPS."""
        steps = int(steps if steps is not None else self.cfg.steps)
        interval = self.cfg.out_interval or steps
        done = 0
        t0 = time.perf_counter()
        while done < steps:
            n = min(interval, steps - done)
            self.state = self._chunk_fn(n)(self.state)
            done += n
            if self.cfg.paranoia:
                self.check_health()
            if callback is not None:
                self._sync()
                callback(self)
        self._sync()
        dt_s = time.perf_counter() - t0
        self.mlups_last = self.cfg.nx * self.cfg.ny * steps / dt_s / 1e6
        return self.mlups_last

    def check_health(self) -> None:
        """Raise if paranoid validation tripped (reports the exact step)."""
        fail = int(self.state.fail_step)
        if fail >= 0:
            raise SimulationDiverged(
                f"paranoid check failed at step {fail}: non-finite f, "
                f"rho <= 0, non-finite disk state, or capacity overflow "
                f"(overflow={int(self.state.overflow)}); state frozen at "
                f"the failing step for inspection", fail,
            )

    def _sync(self) -> None:
        """Wait for all queued device work.

        `block_until_ready` can return before execution completes on
        remote-attached TPU runtimes (observed on the axon platform), so
        we force a one-element device->host fetch, which cannot resolve
        until the whole step chain has run.
        """
        jax.device_get(self.state.step)
        jax.block_until_ready(self.state.f)

    # --- observation ---
    def macroscopic(self):
        """(rho, ux, uy) on host."""
        rho, ux, uy = lbm.moments(lbm.from_storage(self.state.f, self.cfg),
                                  self.cfg.gx, self.cfg.gy)
        return np.asarray(rho), np.asarray(ux), np.asarray(uy)

    def solid_fraction(self):
        d = self.state.disks
        cfg = self.cfg
        x, v, om, r, act = d.x, d.v, d.omega, d.r, d.active
        if cfg.max_disks > 0 and (cfg.wrap_lx or cfg.wrap_ly):
            _, (x, v, om, r, act), _, _, _ = imb.periodic_ghosts(
                x, v, om, r, act, cfg
            )
        eps, _, _ = imb.stamp_solid_fraction(x, v, om, r, act, cfg)
        return np.asarray(jnp.clip(eps, 0.0, 1.0))

    def disk_arrays(self):
        d = self.state.disks
        return {k: np.asarray(v) for k, v in d._asdict().items()}

    def hydro_forces(self):
        """(F (N, 2), T (N,)) hydrodynamic force/torque per disk, from
        one oracle IMB evaluation of the CURRENT state (observation
        only - the stepping paths compute theirs in-kernel). The primary
        use is reading the drag on fixed obstacle disks (DiskSpec.fixed),
        whose forces never feed back into motion. Jitted and cached:
        eager op-by-op dispatch would mean one remote compile per
        primitive on the axon runtime."""
        cfg = self.cfg

        if not hasattr(self, "_hydro_fn"):
            periodic = cfg.max_disks > 0 and bool(cfg.wrap_lx or cfg.wrap_ly)

            def observe(f, d):
                n_real = d.x.shape[0]
                x, v, om, r, act = d.x, d.v, d.omega, d.r, d.active
                gparent = None
                if periodic:
                    _, (x, v, om, r, act), gparent, _, _ = (
                        imb.periodic_ghosts(x, v, om, r, act, cfg)
                    )
                eps, usx, usy = imb.stamp_solid_fraction(x, v, om, r, act, cfg)
                if cfg.bc_west == "inlet":
                    eps, usx, usy = imb.mask_open_columns(eps, usx, usy)
                f_phys = lbm.from_storage(f, cfg)
                _, phix, phiy = imb.collide_imb(f_phys, eps, usx, usy, cfg)
                fh, th = imb.reduce_hydro_forces(
                    x, r, act, eps, phix, phiy, cfg
                )
                if gparent is not None:
                    fh, th = imb.fold_ghost_forces(fh, th, gparent, n_real)
                return fh, th

            self._hydro_fn = jax.jit(observe)
        fh, th = self._hydro_fn(self.state.f, self.state.disks)
        return np.asarray(fh), np.asarray(th)
