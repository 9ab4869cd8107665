"""Fused-Pallas multi-chip step: 1D ('y',) or 2D ('y','x') decomposition.

Split out of sharding.py for readability; see make_sharded_step. The
design (SURVEY.md SS5.7): pre-collision halos are ppermute-exchanged at
kernel DMA granularity (8 rows f32 / 16 rows bf16 / 128 columns -
collision is pointwise, so the kernel simply collides the halo cells
too), the fused kernels run in pre-halo mode on the extended local
frame, and global-edge bounce-back is fixed up outside the kernel on
the shards that hold a domain edge (the kernel cannot know the shard's
mesh position statically).

Corner (diagonal) halo blocks are correct because the x exchange sends
columns of the ALREADY y-extended frame: the west neighbor's y-halo rows
are exactly this shard's diagonal neighbors' corner cells - the same
two-hop trick as the XLA path's exchange_halo.

Wall fixup order matches the oracle (south/north rows first, then
west/east columns overwrite the shared corner populations).

Coupled runs use the same fused IMB+reduce kernel as the single-chip
path (pallas_lbm.fused_step_imb_reduce: phi never leaves VMEM, one
kernel launch per step). The enabling trick is the stamp-canvas
geometry: the local frame is padded by exactly one lattice-tile row of
rows (pady = th) and one 128-col DMA granule of cols on 2D meshes
(padx = 128), so the canvas's stamp tiles align 1:1 with the interior's
(th x 128) stamp sub-tiles - ONE binning serves both the canvas stamp
and the in-kernel interior reduce (interior tile rows are sliced out;
pallas_stamp.remap_entry_slots renumbers the inverse map; disk coords
stay in canvas frame via the kernel's `origin` offsets).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lbmdem_tpu import lattice
from lbmdem_tpu.config import SimConfig, WALL
from lbmdem_tpu.ops import dem, imb, lbm
from lbmdem_tpu.parallel.sharding import (
    _apply_open_boundaries_sharded, _ring_perm, _wall_corr,
)

_HY = 8  # halo rows exchanged (f32 kernel sublane DMA granule)
_HX = 128  # halo cols exchanged for 2D meshes (lane DMA granule)


def canvas_pads(h: int, two_d: bool, coupling_k: int = 1):
    """(pady, padx) of the sharded stamp canvas.

    pady = the local COUPLED lattice-tile height (largest of
    256/128/64/32/16/8 dividing h, mirroring
    pallas_lbm.tile_dims(coupled=True) - including its LBMDEM_TH
    override, so canvas_pads and the stamp tiles can never disagree:
    pady | h makes canvas ny = h + 2*pady divisible by a larger
    candidate only when h itself is, in which case pady IS that
    candidate) so the canvas's stamp tiles align 1:1 with the
    interior's stamp sub-tiles; padx = one 128-col DMA granule on 2D
    meshes -
    exactly the fused kernel's x-halo width, so the kernel's solid
    window is a plain row slice of the canvas."""
    import os

    from lbmdem_tpu.ops.pallas_lbm import coupled_tile_rows

    pady = next(t for t in coupled_tile_rows(coupling_k) if h % t == 0)
    th_env = os.environ.get("LBMDEM_TH")
    if th_env and h % int(th_env) == 0:
        pady = int(th_env)
    return pady, (_HX if two_d else 0)


def _build(cfg: SimConfig, grid, mesh, h: int, w: int, dem_axis: str,
           temporal_k: int):
    """Shared closure factory: returns (local_step, coupled_step).

    local_step(state, f_scratch) is the per-step shard body (fresh
    binning each step); coupled_step(state, f_scratch, ctx) is the
    coupled body taking an explicit binning context so the Verlet-
    cadence chunk (make_sharded_coupled_chunk) can amortize rebuilds.
    """
    from lbmdem_tpu.ops import pallas_lbm, pallas_stamp
    from lbmdem_tpu.simulation import BIN_MARGIN, SimState

    coupled = cfg.max_disks > 0
    periodic_dem = coupled and bool(cfg.wrap_lx or cfg.wrap_ly)
    # bf16 f storage: exchange halos at the bf16 (16, 128) VMEM tile
    # granule; the kernels dequantize + shift in place, and the edge
    # fixups round-trip their 1-row/col slices through lbm.from_storage
    # / to_storage (one bf16 rounding per stored step, same as the
    # kernel - parity vs single-chip is tolerance-level, not bitwise).
    hy = 16 if cfg.f_storage == "bfloat16" else _HY
    assert cfg.f_storage == "float32" or h % 16 == 0, (
        f"bf16 sharded shards need local ny%16==0 (h={h})"
    )
    use_slab_dem = False
    if coupled:
        from lbmdem_tpu.ops import pallas_dem

        # disks are replicated and forces psum'd, so every shard runs
        # the identical subcycle - the slab kernel drops in per shard
        use_slab_dem = pallas_dem.slab_supported(grid, dem_axis,
                                                 kt=cfg.kt > 0.0)
    ny_sh, nx_sh = mesh.shape["y"], mesh.shape["x"]
    two_d = nx_sh > 1
    prehalo = "yx" if two_d else True
    local_cfg = cfg.replace(ny=h, nx=w)
    opp = lattice.OPP

    if coupled:
        # Stamp canvas: local frame padded so disks straddling the shard
        # boundary stamp their full window AND canvas stamp tiles align
        # with interior stamp sub-tiles (see canvas_pads). Periodic DEM
        # rides the same ghost machinery as the single-chip / XLA paths:
        # ghosts are selected at GLOBAL coords (disk state is
        # replicated), the global->local canvas shift places them inside
        # the apron, and the binning drops out-of-canvas tiles. Fluid
        # periodicity comes free from the ppermute halo ring.
        pady, padx = canvas_pads(h, two_d, cfg.coupling_k)
        canvas_cfg = cfg.replace(ny=h + 2 * pady, nx=w + 2 * padx)
        th_s, tw_s = pallas_stamp.tile_dims(canvas_cfg)
        assert th_s == pady and tw_s == 128, (
            f"canvas stamp tiles ({th_s}x{tw_s}) must align with the "
            f"interior's ({pady}x128) sub-tiles"
        )
        nty_c, ntx_c = canvas_cfg.ny // th_s, canvas_cfg.nx // 128
        nty_i, ntx_i = h // th_s, w // 128
        oy_t, ox_t = pady // th_s, padx // 128
        cap = cfg.tile_cap
        ix_int = slice(padx, padx + w)  # interior cols of the canvas

        def mask_open_canvas(solid):
            """Zou/He boundary columns stay pure fluid (oracle:
            imb.mask_open_columns): zero the canvas column holding
            GLOBAL x = 0 / nx-1 on the edge shards only. THE single
            sharded definition - coupled_step and static_prep must
            apply the identical rule or the static hoist diverges
            from the dynamic path."""
            if cfg.bc_west != "inlet":
                return solid
            ix_sh = jax.lax.axis_index("x")
            cw, ce = padx, padx + w - 1
            return solid.at[:, :, cw].set(
                jnp.where(ix_sh == 0, 0.0, solid[:, :, cw])
            ).at[:, :, ce].set(
                jnp.where(ix_sh == nx_sh - 1, 0.0, solid[:, :, ce])
            )
    else:
        pady = padx = 0

    def _y_row_cols(i):
        # 1D mode: x-wall rules ran in-kernel and win at corners; the
        # external y fixup must leave those entries alone. 2D mode: the
        # external x fixup runs after this one and overwrites corners,
        # so full rows are correct here.
        if two_d:
            return slice(0, w)
        lo = 1 if cfg.bc_west == WALL and int(lattice.E[i, 0]) == 1 else 0
        hi = w - 1 if cfg.bc_east == WALL and int(lattice.E[i, 0]) == -1 else w
        return slice(lo, hi)

    def fix_y_walls(fnew, fpost_bot, fpost_top):
        iy = jax.lax.axis_index("y")
        if cfg.bc_south == WALL:
            at = iy == 0
            for i in (int(j) for j in lattice.IN_N):
                io = int(opp[i])
                corr = _wall_corr(i, cfg.uw_south, 0.0, cfg)
                sl = _y_row_cols(i)
                fnew = fnew.at[i, 0, sl].set(
                    jnp.where(at, fpost_bot[io, 0, sl] + corr,
                              fnew[i, 0, sl]).astype(fnew.dtype)
                )
        if cfg.bc_north == WALL:
            at = iy == ny_sh - 1
            for i in (int(j) for j in lattice.IN_S):
                io = int(opp[i])
                corr = _wall_corr(i, cfg.uw_north, 0.0, cfg)
                sl = _y_row_cols(i)
                fnew = fnew.at[i, -1, sl].set(
                    jnp.where(at, fpost_top[io, 0, sl] + corr,
                              fnew[i, -1, sl]).astype(fnew.dtype)
                )
        return fnew

    def fix_x_walls(fnew, fpost_w, fpost_e):
        # 2D mode only (1D applies x walls in-kernel): runs after
        # fix_y_walls, so corners take the x-wall value (oracle order).
        ix = jax.lax.axis_index("x")
        if cfg.bc_west == WALL:
            at = ix == 0
            for i in (int(j) for j in lattice.IN_E):
                io = int(opp[i])
                corr = _wall_corr(i, 0.0, cfg.uw_west, cfg)
                fnew = fnew.at[i, :, 0].set(
                    jnp.where(at, fpost_w[io, :, 0] + corr,
                              fnew[i, :, 0]).astype(fnew.dtype)
                )
        if cfg.bc_east == WALL:
            at = ix == nx_sh - 1
            for i in (int(j) for j in lattice.IN_W):
                io = int(opp[i])
                corr = _wall_corr(i, 0.0, cfg.uw_east, cfg)
                fnew = fnew.at[i, :, -1].set(
                    jnp.where(at, fpost_e[io, :, 0] + corr,
                              fnew[i, :, -1]).astype(fnew.dtype)
                )
        return fnew

    def exchange(f):
        """(9, h, w) -> (9, h+2*hy, w [+ 2*_HX]) pre-collision frame."""
        lo = jax.lax.ppermute(f[:, -hy:, :], "y", _ring_perm(ny_sh, +1))
        hi = jax.lax.ppermute(f[:, :hy, :], "y", _ring_perm(ny_sh, -1))
        ext = jnp.concatenate([lo, f, hi], axis=1)
        if two_d:
            le = jax.lax.ppermute(ext[:, :, -_HX:], "x", _ring_perm(nx_sh, +1))
            ri = jax.lax.ppermute(ext[:, :, :_HX], "x", _ring_perm(nx_sh, -1))
            ext = jnp.concatenate([le, ext, ri], axis=2)
        return ext

    def col_imb(frows, eps_s, usx_s, usy_s):
        """Storage-aware 1-row/col oracle IMB collide for the edge
        fixups (physical compute between quantized states, exactly the
        oracle path's bf16 emulation; identity round-trip for f32)."""
        fp, _, _ = imb.collide_imb(
            lbm.from_storage(frows, cfg), eps_s, usx_s, usy_s, cfg
        )
        return lbm.to_storage(fp, cfg)

    def coupled_step(state: SimState, f_scratch, ctx) -> SimState:
        """One coupled step on the local shard.

        ctx = None: fresh canvas binning in-step (margin 0), the plain
        per-step entry point. ctx = (lists, counts_c, entries_i, x_bin,
        gparent, gaxes): a Verlet-cadence rebuild from
        make_sharded_coupled_chunk - positions were wrapped and ghosts
        selected at the rebuild; per-step travel beyond BIN_MARGIN is
        counted into state.overflow (same contract as
        simulation.make_step_fn's tile_lists)."""
        d = state.disks
        n_real = d.x.shape[0]
        f = state.f
        f_ext = exchange(f)

        oy_g = (jax.lax.axis_index("y") * h).astype(jnp.float32)
        ox_g = (jax.lax.axis_index("x") * w).astype(jnp.float32)
        # global -> canvas frame (canvas cell (0,0) is global
        # (oy_g - pady, ox_g - padx))
        shift_c = jnp.stack([ox_g - padx, oy_g - pady]).astype(d.x.dtype)

        if ctx is None:
            gparent = gaxes = None
            govf = jnp.zeros((), jnp.int32)
            if periodic_dem:
                # wrap + ghost-select at GLOBAL coords (replicated disk
                # state: every shard computes the same augmentation)
                # BEFORE the local-frame shift, as the XLA path does
                xw, aug, gparent, _, govf = imb.periodic_ghosts(
                    d.x, d.v, d.omega, d.r, d.active, cfg
                )
                d = d._replace(x=xw)
                xa, va, oma, ra, acta = aug
            else:
                xa, va, oma, ra, acta = d.x, d.v, d.omega, d.r, d.active
            xloc = xa - shift_c[None, :]
            lists, counts_c, entries_c, bovf = (
                pallas_stamp.build_tile_lists(xloc, acta, canvas_cfg)
            )
            entries_i = pallas_stamp.remap_entry_slots(
                entries_c, cap, ntx_c, oy_t, ox_t, nty_i, ntx_i
            )
            bovf = jnp.maximum(bovf, govf)
        else:
            lists, counts_c, entries_i, x_bin, gparent, gaxes = ctx
            travel2 = jnp.where(
                d.active, jnp.sum((d.x - x_bin) ** 2, axis=-1), 0.0
            )
            bovf = jnp.sum(
                travel2 > float(BIN_MARGIN) ** 2, dtype=jnp.int32
            )
            if periodic_dem:
                xa, va, oma, ra, acta = imb.apply_ghosts(
                    gparent, gaxes, d.x, d.v, d.omega, d.r, d.active, cfg
                )
            else:
                xa, va, oma, ra, acta = d.x, d.v, d.omega, d.r, d.active
            xloc = xa - shift_c[None, :]

        tile_data = pallas_stamp.gather_tile_data(
            lists, xloc, va, oma, ra, acta
        )
        solid, _ = pallas_stamp.stamp_solid_fraction(
            xloc, va, oma, ra, acta, canvas_cfg,
            binned=(tile_data, counts_c, None, None), as_stack=True,
        )
        solid = mask_open_canvas(solid)
        # interior tile rows of the canvas binning feed the fused reduce
        td_i = tile_data.reshape(nty_c, ntx_c, cap * 8)[
            oy_t : oy_t + nty_i, ox_t : ox_t + ntx_i
        ].reshape(nty_i * ntx_i, 1, cap * 8)
        cnt_i = counts_c.reshape(nty_c, ntx_c)[
            oy_t : oy_t + nty_i, ox_t : ox_t + ntx_i
        ].reshape(nty_i * ntx_i, 1, 1)
        # kernel solid window: canvas rows [pady-8, pady+h+8); cols are
        # the full canvas (2D: padx == _HX is exactly the x-halo width)
        s_k = solid[:, pady - _HY : pady + h + _HY, :]
        fnew, partials = pallas_lbm.fused_step_imb_reduce(
            f_ext, s_k, None, None, local_cfg, td_i, cnt_i,
            out_buf=f_scratch, prehalo=prehalo, origin=(pady, padx),
        )
        # global-edge bounce-back: recompute fpost on the edge rows/cols
        # with the oracle (identical formulas; 1-row/col)
        fp_bot = col_imb(
            f[:, 0:1, :], solid[0, pady : pady + 1, ix_int],
            solid[1, pady : pady + 1, ix_int],
            solid[2, pady : pady + 1, ix_int],
        )
        fp_top = col_imb(
            f[:, -1:, :], solid[0, pady + h - 1 : pady + h, ix_int],
            solid[1, pady + h - 1 : pady + h, ix_int],
            solid[2, pady + h - 1 : pady + h, ix_int],
        )
        fnew = fix_y_walls(fnew, fp_bot, fp_top)
        if two_d:
            iy_i = slice(pady, pady + h)
            fp_w = col_imb(
                f[:, :, 0:1], solid[0, iy_i, padx : padx + 1],
                solid[1, iy_i, padx : padx + 1],
                solid[2, iy_i, padx : padx + 1],
            )
            fp_e = col_imb(
                f[:, :, -1:], solid[0, iy_i, padx + w - 1 : padx + w],
                solid[1, iy_i, padx + w - 1 : padx + w],
                solid[2, iy_i, padx + w - 1 : padx + w],
            )
            fnew = fix_x_walls(fnew, fp_w, fp_e)
        # Zou/He open boundaries: external edge-shard fixup (the kernel
        # skips its in-kernel closure in every prehalo mode - it lacks
        # the global row offset and the post-fixup wall corners); shared
        # with the XLA sharded path so the reconstruction is identical.
        fnew = _apply_open_boundaries_sharded(fnew, cfg, h, nx_sh)
        fh_p, th_p = pallas_stamp.gather_partials(
            partials, entries_i, d.x.dtype
        )
        fh = jax.lax.psum(fh_p, ("y", "x"))
        th = jax.lax.psum(th_p, ("y", "x"))
        if periodic_dem:
            fh, th = imb.fold_ghost_forces(fh, th, gparent, n_real)
        if use_slab_dem:
            from lbmdem_tpu.ops import pallas_dem

            disks, ovf, nc = pallas_dem.dem_subcycle(
                d, fh, th, grid, cfg, dem_axis
            )
        else:
            disks, ovf, nc = dem.dem_subcycle(d, fh, th, grid, cfg)
        if cfg.bc_west == "inlet":
            # mobile disks leaving through the open x ends (disk state
            # is replicated: every shard culls identically)
            disks = dem.cull_open_boundaries(disks, cfg)
        return SimState(
            f=fnew,
            disks=disks,
            step=state.step + 1,
            overflow=jnp.maximum(state.overflow, jnp.maximum(ovf, bovf)),
            n_contacts=nc,
            fail_step=state.fail_step,
        )

    def coupled_window_step(state: SimState, f_scratch, ctx,
                            k: int) -> SimState:
        """k coupled steps per exchange (cfg.coupling_k, the dynamic
        sibling of static_step): ONE ppermute exchange + ONE canvas
        stamp feed k fused inner steps over frozen window-start solid
        fields; the per-inner-step force partials psum once as a
        stacked (k, ...) tensor and drive k sequential DEM
        applications. Global-edge BB + Zou/He run IN-KERNEL via the
        mesh-position flags (inner steps are invisible out here), so
        the external edge fixups are skipped - exactly the static
        hoist's contract. ctx is the Verlet-cadence rebuild
        (make_sharded_coupled_chunk)."""
        d = state.disks
        n_real = d.x.shape[0]
        f_ext = exchange(state.f)

        oy_g = (jax.lax.axis_index("y") * h).astype(jnp.float32)
        ox_g = (jax.lax.axis_index("x") * w).astype(jnp.float32)
        shift_c = jnp.stack([ox_g - padx, oy_g - pady]).astype(d.x.dtype)

        lists, counts_c, entries_i, x_bin, gparent, gaxes = ctx
        travel2 = jnp.where(
            d.active, jnp.sum((d.x - x_bin) ** 2, axis=-1), 0.0
        )
        bovf = jnp.sum(travel2 > float(BIN_MARGIN) ** 2, dtype=jnp.int32)
        if periodic_dem:
            xa, va, oma, ra, acta = imb.apply_ghosts(
                gparent, gaxes, d.x, d.v, d.omega, d.r, d.active, cfg
            )
        else:
            xa, va, oma, ra, acta = d.x, d.v, d.omega, d.r, d.active
        xloc = xa - shift_c[None, :]

        tile_data = pallas_stamp.gather_tile_data(
            lists, xloc, va, oma, ra, acta
        )
        solid, _ = pallas_stamp.stamp_solid_fraction(
            xloc, va, oma, ra, acta, canvas_cfg,
            binned=(tile_data, counts_c, None, None), as_stack=True,
        )
        solid = mask_open_canvas(solid)
        td_i = tile_data.reshape(nty_c, ntx_c, cap * 8)[
            oy_t : oy_t + nty_i, ox_t : ox_t + ntx_i
        ].reshape(nty_i * ntx_i, 1, cap * 8)
        cnt_i = counts_c.reshape(nty_c, ntx_c)[
            oy_t : oy_t + nty_i, ox_t : ox_t + ntx_i
        ].reshape(nty_i * ntx_i, 1, 1)
        s_k = solid[:, pady - _HY : pady + h + _HY, :]
        iy_m = jax.lax.axis_index("y")
        ix_m = jax.lax.axis_index("x")
        edges = jnp.stack(
            [(iy_m == 0).astype(jnp.int32),
             (iy_m == ny_sh - 1).astype(jnp.int32),
             (ix_m == 0).astype(jnp.int32),
             (ix_m == nx_sh - 1).astype(jnp.int32),
             (iy_m * h).astype(jnp.int32)]
        )
        fnew, partials = pallas_lbm.fused_step_imb_reduce_multi(
            f_ext, s_k, local_cfg, k, td_i, cnt_i, out_buf=f_scratch,
            prehalo=prehalo, origin=(pady, padx), edges=edges,
            ny_glob=cfg.ny,
        )
        # per-inner-step forces: gather shard-locally (small), then ONE
        # stacked psum over the mesh for all k steps
        fh_p = []
        th_p = []
        for t in range(k):
            fh_t, th_t = pallas_stamp.gather_partials(
                partials[t], entries_i, d.x.dtype
            )
            fh_p.append(fh_t)
            th_p.append(th_t)
        fh_k = jax.lax.psum(jnp.stack(fh_p), ("y", "x"))
        th_k = jax.lax.psum(jnp.stack(th_p), ("y", "x"))
        forces = []
        for t in range(k):
            fh, th = fh_k[t], th_k[t]
            if periodic_dem:
                fh, th = imb.fold_ghost_forces(fh, th, gparent, n_real)
            forces.append((fh, th))
        ovf = bovf
        if use_slab_dem:
            from lbmdem_tpu.ops import pallas_dem

            # window-persistent slabs: one build/unslab per window
            disks, ovf_t, nc = pallas_dem.dem_subcycle_window(
                d, forces, grid, cfg, dem_axis
            )
            ovf = jnp.maximum(ovf, ovf_t)
        else:
            disks = d
            nc = state.n_contacts
            for fh, th in forces:
                disks, ovf_t, nc = dem.dem_subcycle(disks, fh, th, grid,
                                                    cfg)
                ovf = jnp.maximum(ovf, ovf_t)
        if cfg.bc_west == "inlet":
            disks = dem.cull_open_boundaries(disks, cfg)
        return SimState(
            f=fnew,
            disks=disks,
            step=state.step + k,
            overflow=jnp.maximum(state.overflow, ovf),
            n_contacts=nc,
            fail_step=state.fail_step,
        )

    def static_step(state: SimState, f_scratch, s_k, k) -> SimState:
        """k all-fixed-at-rest coupled steps per exchange: the kernel
        solid window arrives as a sharded loop constant
        (make_sharded_static_chunk's prep), and the temporal-blocked
        static IMB kernel runs global-edge BB + Zou/He in-kernel via
        the mesh-position flags - ONE ppermute exchange feeds k steps,
        no binning, no stamp, no psum, no external fixups."""
        f_ext = exchange(state.f)
        iy_m = jax.lax.axis_index("y")
        ix_m = jax.lax.axis_index("x")
        edges = jnp.stack(
            [(iy_m == 0).astype(jnp.int32),
             (iy_m == ny_sh - 1).astype(jnp.int32),
             (ix_m == 0).astype(jnp.int32),
             (ix_m == nx_sh - 1).astype(jnp.int32),
             (iy_m * h).astype(jnp.int32)]
        )
        fnew = pallas_lbm.fused_step_imb_static_multi(
            f_ext, s_k, local_cfg, k, out_buf=f_scratch,
            prehalo=prehalo, edges=edges, ny_glob=cfg.ny,
        )
        return state._replace(f=fnew, step=state.step + k)

    def static_prep(d):
        """Per-shard kernel solid window of the immutable disk state
        (replicated input -> sharded constant; rows [pady-8, pady+h+8)
        of the canvas stamp, all canvas cols). The binning overflow is
        summed over shards for the one-time host check."""
        govf = jnp.zeros((), jnp.int32)
        if periodic_dem:
            _, (xa, va, oma, ra, acta), _, _, govf = imb.periodic_ghosts(
                d.x, d.v, d.omega, d.r, d.active, cfg
            )
        else:
            xa, va, oma, ra, acta = d.x, d.v, d.omega, d.r, d.active
        oy_g = (jax.lax.axis_index("y") * h).astype(jnp.float32)
        ox_g = (jax.lax.axis_index("x") * w).astype(jnp.float32)
        shift_c = jnp.stack([ox_g - padx, oy_g - pady]).astype(d.x.dtype)
        xloc = xa - shift_c[None, :]
        lists, counts_c, _, bovf = pallas_stamp.build_tile_lists(
            xloc, acta, canvas_cfg
        )
        tile_data = pallas_stamp.gather_tile_data(
            lists, xloc, va, oma, ra, acta
        )
        solid, _ = pallas_stamp.stamp_solid_fraction(
            xloc, va, oma, ra, acta, canvas_cfg,
            binned=(tile_data, counts_c, None, None), as_stack=True,
        )
        solid = mask_open_canvas(solid)
        ovf = jax.lax.psum(jnp.maximum(bovf, govf), ("y", "x"))
        return solid[:, pady - _HY : pady + h + _HY, :], ovf

    def local_step(state: SimState, f_scratch) -> SimState:
        # f_scratch: dead (9, h, w) shard donated for the kernel output
        # (avoids XLA's while-carry copy; see pallas_lbm.fused_step_fluid)
        if coupled:
            return coupled_step(state, f_scratch, None)
        f_ext = exchange(state.f)
        if temporal_k > 1:
            # temporal blocking: the exchanged halo (8 rows f32 / 16
            # bf16, 128 cols) IS the k<=hy dependency-cone margin, so
            # ONE ppermute exchange feeds k steps - per-step ICI traffic
            # drops k-fold. Edge bounce-back AND the Zou/He open-bc
            # closures run in-kernel (flagged by mesh position; the
            # inlet profile needs the shard's global row offset, slot 4
            # of the SMEM edge array); no external fixup (inner steps
            # are invisible out here).
            iy_m = jax.lax.axis_index("y")
            ix_m = jax.lax.axis_index("x")
            edges = jnp.stack(
                [(iy_m == 0).astype(jnp.int32),
                 (iy_m == ny_sh - 1).astype(jnp.int32),
                 (ix_m == 0).astype(jnp.int32),
                 (ix_m == nx_sh - 1).astype(jnp.int32),
                 (iy_m * h).astype(jnp.int32)]
            )
            fnew = pallas_lbm.fused_step_fluid_multi(
                f_ext, local_cfg, temporal_k, prehalo=prehalo, edges=edges,
                out_buf=f_scratch, ny_glob=cfg.ny,
            )
            return state._replace(f=fnew, step=state.step + temporal_k)
        fnew = pallas_lbm.fused_step_fluid(f_ext, local_cfg, prehalo=prehalo,
                                           out_buf=f_scratch)

        def col(a):
            # storage-aware 1-row oracle collide for the edge fixup; the
            # result stays in STORAGE form (the +corr bounce-back add is
            # shift-invariant since w_opp = w_i)
            fp = lbm.collide(lbm.from_storage(a, cfg), cfg.tau, cfg.gx,
                             cfg.gy, cfg.smagorinsky, cfg.trt_lambda)
            return lbm.to_storage(fp, cfg)

        fnew = fix_y_walls(fnew, col(state.f[:, 0:1, :]),
                           col(state.f[:, -1:, :]))
        if two_d:
            fnew = fix_x_walls(fnew, col(state.f[:, :, 0:1]),
                               col(state.f[:, :, -1:]))
        # Zou/He open boundaries (no-op unless bc_west == 'inlet'; the
        # fixup is storage-aware: bf16 fnew holds shifted g and the
        # closures run in f32 with the +rho0 density-sum shift)
        fnew = _apply_open_boundaries_sharded(fnew, cfg, h, nx_sh)
        return state._replace(f=fnew, step=state.step + 1)

    if not coupled:
        return local_step, None, None, None, None
    return (local_step, coupled_step, static_step, static_prep,
            coupled_window_step)


def make_sharded_step_pallas(cfg: SimConfig, grid, mesh, h: int, w: int,
                             dem_axis: str = "y", temporal_k: int = 1):
    from lbmdem_tpu.simulation import SimState
    from lbmdem_tpu.parallel.sharding import state_specs

    local_step, _, _, _, _ = _build(cfg, grid, mesh, h, w, dem_axis,
                                 temporal_k)
    specs = state_specs()
    # check_vma=False: pallas_call outputs carry no varying-axis metadata
    sharded = jax.shard_map(
        local_step, mesh=mesh, in_specs=(specs, specs.f), out_specs=specs,
        check_vma=False,
    )

    def stepfn(state: SimState, f_scratch=None) -> SimState:
        if f_scratch is None:
            f_scratch = jnp.zeros_like(state.f)
        return sharded(state, f_scratch)

    if cfg.paranoia:
        from lbmdem_tpu.simulation import paranoid_wrap

        stepfn = paranoid_wrap(stepfn, cfg)
    return stepfn


def make_sharded_coupled_chunk(cfg: SimConfig, grid, mesh, h: int, w: int,
                               n: int, dem_axis: str = "y"):
    """`n` coupled steps per call with Verlet-cadence canvas binning.

    The whole cadence loop lives INSIDE shard_map (the binning is
    shard-local: it depends on lax.axis_index), mirroring the
    single-chip Verlet-cadence chunk (Simulation._chunk_fn): every
    BIN_CADENCE steps, wrap + ghost-select (periodic decks) and rebuild
    the canvas tile lists with BIN_MARGIN cells of slack; the steps in
    between only re-gather disk data at current positions. Per-step
    travel beyond the margin is counted into state.overflow. The two
    f buffers ping-pong through the donated kernel output exactly as
    the single-chip chunk does. Per-step paranoid mode keeps the
    per-step path (its validation wraps the shard_map boundary);
    paranoia="chunk" validates here once per cadence block -
    shard-local state_ok pmin'd over the mesh so the freeze is
    uniform."""
    from lbmdem_tpu.ops import pallas_stamp
    from lbmdem_tpu.simulation import (
        BIN_CADENCE, BIN_MARGIN, paranoid_commit, pingpong_loop, state_ok,
    )
    from lbmdem_tpu.parallel.sharding import state_specs

    assert cfg.max_disks > 0 and cfg.paranoia_mode != "step"
    par_chunk = cfg.paranoia_mode == "chunk"
    _, coupled_step, _, _, coupled_window_step = _build(
        cfg, grid, mesh, h, w, dem_axis, 1
    )
    periodic_dem = bool(cfg.wrap_lx or cfg.wrap_ly)
    two_d = mesh.shape["x"] > 1
    pady, padx = canvas_pads(h, two_d, cfg.coupling_k)
    canvas_cfg = cfg.replace(ny=h + 2 * pady, nx=w + 2 * padx)
    th_s, _ = pallas_stamp.tile_dims(canvas_cfg)
    nty_c, ntx_c = canvas_cfg.ny // th_s, canvas_cfg.nx // 128
    nty_i, ntx_i = h // th_s, w // 128
    oy_t, ox_t = pady // th_s, padx // 128
    cap = cfg.tile_cap

    def k_steps(carry, k):
        st, scr = carry
        st_in = st
        d = st.disks
        gparent = gaxes = None
        if periodic_dem:
            # wrap + ghost-select ONLY at rebuild points: the ghost
            # threshold carries the same BIN_MARGIN slack as the tile
            # lists, and the travel check flags violations
            xw, (xb, _, _, _, actb), gparent, gaxes, govf = (
                imb.periodic_ghosts(
                    d.x, d.v, d.omega, d.r, d.active, cfg,
                    margin=BIN_MARGIN,
                )
            )
            d = d._replace(x=xw)
            st = st._replace(
                disks=d, overflow=jnp.maximum(st.overflow, govf)
            )
        else:
            xb, actb = d.x, d.active
        oy_g = (jax.lax.axis_index("y") * h).astype(jnp.float32)
        ox_g = (jax.lax.axis_index("x") * w).astype(jnp.float32)
        shift_c = jnp.stack([ox_g - padx, oy_g - pady]).astype(xb.dtype)
        lists, counts_c, entries_c, bovf = pallas_stamp.build_tile_lists(
            xb - shift_c[None, :], actb, canvas_cfg, margin=BIN_MARGIN
        )
        entries_i = pallas_stamp.remap_entry_slots(
            entries_c, cap, ntx_c, oy_t, ox_t, nty_i, ntx_i
        )
        st = st._replace(overflow=jnp.maximum(st.overflow, bovf))
        ctx = (lists, counts_c, entries_i, d.x, gparent, gaxes)
        ck = cfg.coupling_k
        if ck > 1:
            # coupling-cadence temporal blocking: k//ck fused windows
            # (one exchange + one stamp each, per-inner-step forces),
            # per-step remainder
            nwin, rem = divmod(k, ck)
            if nwin:
                st, scr = pingpong_loop(
                    lambda s, sc: coupled_window_step(s, sc, ctx, ck),
                    st, scr, nwin,
                )
            if rem:
                st, scr = pingpong_loop(
                    lambda s, sc: coupled_step(s, sc, ctx), st, scr, rem
                )
        else:
            st, scr = pingpong_loop(lambda s, sc: coupled_step(s, sc, ctx),
                                    st, scr, k)
        if par_chunk:
            # shard-local validity, pmin'd so every shard freezes (or
            # not) identically; fail_step = block-end step
            ok = jax.lax.pmin(
                state_ok(cfg, st).astype(jnp.int32), ("y", "x")
            ) > 0
            st = paranoid_commit(st_in, st, ok)
        return st, scr

    def local_chunk(state, f_scratch):
        n_outer, n_rem = divmod(n, BIN_CADENCE)
        carry = (state, f_scratch)
        if n_outer:
            carry = jax.lax.fori_loop(
                0, n_outer, lambda _, c: k_steps(c, BIN_CADENCE), carry
            )
        if n_rem:
            carry = k_steps(carry, n_rem)
        return carry[0]

    specs = state_specs()
    sharded = jax.shard_map(
        local_chunk, mesh=mesh, in_specs=(specs, specs.f), out_specs=specs,
        check_vma=False,
    )

    def chunkfn(state):
        return sharded(state, jnp.zeros_like(state.f))

    return chunkfn


def make_sharded_static_chunk(cfg: SimConfig, grid, mesh, h: int, w: int,
                              dem_axis: str = "y"):
    """(prep, chunk_factory) for the static-solid hoist on a mesh.

    `prep(state)` runs one shard_map pass turning the (replicated,
    immutable) disk state into a SHARDED loop constant: the per-shard
    kernel solid window (the hydro reduce is absent from the hoisted
    chunk - drag on the obstacles stays observable through
    Simulation.hydro_forces). It returns (ops, overflow) - the caller
    checks overflow == 0 once on the host. `chunk_factory(n)` returns
    chunk(state, *ops) running n temporal-blocked static-IMB steps
    (fused_step_imb_static_multi: k steps per ppermute exchange,
    ping-ponged donated buffers), the mesh analogue of
    Simulation._chunk_fn's single-chip static branch."""
    from jax.sharding import PartitionSpec as P

    from lbmdem_tpu.parallel.sharding import state_specs
    from lbmdem_tpu.simulation import (
        TEMPORAL_K, paranoid_commit, pingpong_loop, state_ok,
    )

    assert cfg.max_disks > 0 and cfg.paranoia_mode != "step"
    par_chunk = cfg.paranoia_mode == "chunk"
    _, _, static_step, static_prep, _ = _build(cfg, grid, mesh, h, w,
                                            dem_axis, 1)
    specs = state_specs()
    solid_spec = P(None, "y", "x")
    prep_sharded = jax.shard_map(
        static_prep, mesh=mesh, in_specs=(specs.disks,),
        out_specs=(solid_spec, P()), check_vma=False,
    )

    def prep(state):
        solid, ovf = prep_sharded(state.disks)
        return (solid,), ovf

    def chunk_factory(n: int):
        kblk = TEMPORAL_K if n >= TEMPORAL_K > 1 else 1

        def sstep(s, sc, solid, k):
            new = static_step(s, sc, solid, k)
            if par_chunk:
                # paranoia="chunk": validate at the kernel boundary
                # (every k steps), freeze uniformly across shards
                ok = jax.lax.pmin(
                    state_ok(cfg, new).astype(jnp.int32), ("y", "x")
                ) > 0
                new = paranoid_commit(s, new, ok)
            return new

        def local_chunk(state, f_scratch, solid):
            nk, tail = divmod(n, kblk)
            st, scr = pingpong_loop(
                lambda s, sc: sstep(s, sc, solid, kblk),
                state, f_scratch, nk,
            )
            if tail:
                st, _ = pingpong_loop(
                    lambda s, sc: sstep(s, sc, solid, 1),
                    st, scr, tail,
                )
            return st

        sharded = jax.shard_map(
            local_chunk, mesh=mesh,
            in_specs=(specs, specs.f, solid_spec),
            out_specs=specs, check_vma=False,
        )

        def chunkfn(state, solid):
            return sharded(state, jnp.zeros_like(state.f), solid)

        return chunkfn

    return prep, chunk_factory
