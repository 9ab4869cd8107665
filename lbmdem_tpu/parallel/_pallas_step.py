"""Fused-Pallas multi-chip step: 1D ('y',) or 2D ('y','x') decomposition.

Split out of sharding.py for readability; see make_sharded_step. The
design (SURVEY.md SS5.7): pre-collision halos are ppermute-exchanged at
kernel DMA granularity (8 rows / 128 columns - collision is pointwise,
so the kernel simply collides the halo cells too), the fused kernels run
in pre-halo mode on the extended local frame, and global-edge bounce-
back is fixed up outside the kernel on the shards that hold a domain
edge (the kernel cannot know the shard's mesh position statically).

Corner (diagonal) halo blocks are correct because the x exchange sends
columns of the ALREADY y-extended frame: the west neighbor's y-halo rows
are exactly this shard's diagonal neighbors' corner cells - the same
two-hop trick as the XLA path's exchange_halo.

Wall fixup order matches the oracle (south/north rows first, then
west/east columns overwrite the shared corner populations).
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

_HY = 8  # halo rows exchanged (kernel sublane DMA granule)
_HX = 128  # halo cols exchanged for 2D meshes (lane DMA granule)
_PAD = 32  # stamp-canvas padding rows/cols per side (tile divisor)


def make_sharded_step_pallas(cfg: SimConfig, grid, mesh, h: int, w: int,
                             dem_axis: str = "y", temporal_k: int = 1):
    from lbmdem_tpu.ops import pallas_lbm, pallas_stamp
    from lbmdem_tpu.simulation import SimState
    from lbmdem_tpu.parallel.sharding import state_specs

    coupled = cfg.max_disks > 0
    # bf16 f storage: exchange halos at the bf16 (16, 128) VMEM tile
    # granule; the kernels dequantize + shift in place. Pure fluid
    # only - the coupled path's stamp canvas and edge-fixup collide
    # assume raw-f32 f (pallas_supported gates this with a clear error).
    assert cfg.f_storage == "float32" or not coupled, (
        "sharded Pallas coupled path is float32-storage only"
    )
    # Periodic DEM rides the same ghost machinery as the single-chip /
    # XLA-sharded paths: ghosts are selected at GLOBAL coords (disk
    # state is replicated), the global->local canvas shift places them
    # inside the _PAD apron, and the binning drops out-of-canvas tiles.
    # Fluid periodicity comes free from the ppermute halo ring.
    periodic_dem = coupled and bool(cfg.wrap_lx or cfg.wrap_ly)
    hy = 16 if cfg.f_storage == "bfloat16" else _HY
    assert cfg.f_storage == "float32" or h % 16 == 0, (
        f"bf16 sharded shards need local ny%16==0 (h={h})"
    )
    use_slab_dem = False
    if coupled and cfg.kt == 0.0:
        from lbmdem_tpu.ops import pallas_dem

        # disks are replicated and forces psum'd, so every shard runs
        # the identical subcycle - the slab kernel drops in per shard
        use_slab_dem = pallas_dem.slab_supported(grid, dem_axis)
    ny_sh, nx_sh = mesh.shape["y"], mesh.shape["x"]
    two_d = nx_sh > 1
    prehalo = "yx" if two_d else True
    padx = _PAD if two_d else 0
    local_cfg = cfg.replace(ny=h, nx=w)
    # Stamp canvas: local frame padded by _PAD cells per side (rows
    # always; cols only on 2D meshes) so disks straddling the shard
    # boundary stamp their full window; the kernel consumes the
    # [PAD-8, PAD+h+8) x [PAD-128, PAD+w+128) slice matching its
    # pre-halo window. _PAD < _HX is fine for columns: the kernel's
    # x halo beyond the canvas pad is zero-filled, and only +-1 column
    # of it is ever consumed by streaming.
    ext_cfg = cfg.replace(ny=h + 2 * _PAD, nx=w + 2 * padx)
    opp = lattice.OPP

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

    # slices of the stamp canvas matching the kernel's pre-halo window
    sl_y = slice(_PAD - _HY, _PAD + h + _HY)
    if two_d:
        # canvas cols cover [PAD-128, PAD+w+128) relative to the local
        # frame; the canvas itself is only padded by _PAD(=32) cols, so
        # prepend/append zero blocks up to the 128-col DMA granule.
        def kernel_cols(a):
            zw = jnp.zeros((a.shape[0], _HX - padx), a.dtype)
            return jnp.concatenate([zw, a, zw], axis=1)
    else:
        def kernel_cols(a):
            return a

    ix_int = slice(padx, padx + w)  # interior cols of the stamp canvas

    def local_step(state: SimState, f_scratch) -> SimState:
        # f_scratch: dead (9, h, w) shard donated for the kernel output
        # (avoids XLA's while-carry copy; see pallas_lbm.fused_step_fluid)
        f = state.f  # (9, h, w) local
        f_ext = exchange(f)

        if coupled:
            d = state.disks
            govf = jnp.zeros((), jnp.int32)
            if periodic_dem:
                # wrap + ghost-select at GLOBAL coords (replicated disk
                # state: every shard computes the same augmentation)
                # BEFORE the local-frame shift, exactly as the XLA
                # sharded path does
                xw, aug, gparent, _, govf = imb.periodic_ghosts(
                    d.x, d.v, d.omega, d.r, d.active, cfg
                )
                d = d._replace(x=xw)
                xa, va, oma, ra, acta = aug
            else:
                xa, va, oma, ra, acta = d.x, d.v, d.omega, d.r, d.active
            oy = (jax.lax.axis_index("y") * h).astype(f.dtype)
            ox = (jax.lax.axis_index("x") * w).astype(f.dtype)
            shift = jnp.stack([ox - padx, oy - _PAD])
            xloc = xa - shift[None, :]
            binned = pallas_stamp.bin_disks_to_tiles(
                xloc, va, oma, ra, acta, ext_cfg
            )
            tile_data, counts, entry_slots, bovf = binned
            bovf = jnp.maximum(bovf, govf)
            eps, usx, usy, _ = pallas_stamp.stamp_solid_fraction(
                xloc, va, oma, ra, acta, ext_cfg, binned=binned
            )
            if cfg.bc_west == "inlet":
                # Zou/He boundary columns stay pure fluid (oracle:
                # imb.mask_open_columns): zero the canvas column holding
                # GLOBAL x = 0 / nx-1 on the edge shards only
                ix_sh = jax.lax.axis_index("x")
                at_w = ix_sh == 0
                at_e = ix_sh == nx_sh - 1
                cw, ce = padx, padx + w - 1
                eps, usx, usy = (
                    a.at[:, cw].set(jnp.where(at_w, 0.0, a[:, cw]))
                    .at[:, ce].set(jnp.where(at_e, 0.0, a[:, ce]))
                    for a in (eps, usx, usy)
                )
            fnew, phix, phiy = pallas_lbm.fused_step_imb(
                f_ext,
                kernel_cols(eps[sl_y]),
                kernel_cols(usx[sl_y]),
                kernel_cols(usy[sl_y]),
                local_cfg, prehalo=prehalo, out_buf=f_scratch,
            )
            # global-edge bounce-back: recompute fpost on the edge
            # rows/cols with the oracle (identical formulas; 1-row/col)
            fp_bot, _, _ = imb.collide_imb(
                f[:, 0:1, :], eps[_PAD : _PAD + 1, ix_int],
                usx[_PAD : _PAD + 1, ix_int], usy[_PAD : _PAD + 1, ix_int],
                cfg,
            )
            fp_top, _, _ = imb.collide_imb(
                f[:, -1:, :], eps[_PAD + h - 1 : _PAD + h, ix_int],
                usx[_PAD + h - 1 : _PAD + h, ix_int],
                usy[_PAD + h - 1 : _PAD + h, ix_int], cfg,
            )
            fnew = fix_y_walls(fnew, fp_bot, fp_top)
            if two_d:
                iy_int = slice(_PAD, _PAD + h)
                fp_w, _, _ = imb.collide_imb(
                    f[:, :, 0:1], eps[iy_int, padx : padx + 1],
                    usx[iy_int, padx : padx + 1],
                    usy[iy_int, padx : padx + 1], cfg,
                )
                fp_e, _, _ = imb.collide_imb(
                    f[:, :, -1:], eps[iy_int, padx + w - 1 : padx + w],
                    usx[iy_int, padx + w - 1 : padx + w],
                    usy[iy_int, padx + w - 1 : padx + w], cfg,
                )
                fnew = fix_x_walls(fnew, fp_w, fp_e)
            # Zou/He open boundaries: external edge-shard fixup (the
            # kernel skips its in-kernel closure in every prehalo mode -
            # it lacks the global row offset and the post-fixup wall
            # corners); shared with the XLA sharded path so the
            # reconstruction is identical there.
            fnew = _apply_open_boundaries_sharded(fnew, cfg, h, nx_sh)
            # reduce on the extended canvas: zero-pad phi into it (halo
            # cells belong to the neighbor shard)
            phix_e = jnp.zeros(
                (h + 2 * _PAD, w + 2 * padx), phix.dtype
            ).at[_PAD : _PAD + h, ix_int].set(phix)
            phiy_e = jnp.zeros_like(phix_e).at[_PAD : _PAD + h, ix_int].set(phiy)
            fh_p, th_p = pallas_stamp.reduce_hydro_forces(
                xloc, ra, acta, eps, phix_e, phiy_e, ext_cfg,
                tile_data, counts, entry_slots,
            )
            fh = jax.lax.psum(fh_p, ("y", "x"))
            th = jax.lax.psum(th_p, ("y", "x"))
            if periodic_dem:
                fh, th = imb.fold_ghost_forces(fh, th, gparent,
                                               d.x.shape[0])
            if use_slab_dem:
                from lbmdem_tpu.ops import pallas_dem

                disks, ovf, nc = pallas_dem.dem_subcycle(
                    d, fh, th, grid, cfg, dem_axis
                )
            else:
                disks, ovf, nc = dem.dem_subcycle(d, fh, th, grid, cfg)
            if cfg.bc_west == "inlet":
                # mobile disks leaving through the open x ends (disk
                # state is replicated: every shard culls identically)
                disks = dem.cull_open_boundaries(disks, cfg)
            return SimState(
                f=fnew,
                disks=disks,
                step=state.step + 1,
                overflow=jnp.maximum(state.overflow, jnp.maximum(ovf, bovf)),
                n_contacts=nc,
                fail_step=state.fail_step,
            )
        if temporal_k > 1:
            # temporal blocking: the exchanged 8-row (/128-col) halo IS
            # the k<=8 dependency-cone margin, so ONE ppermute exchange
            # feeds k steps - per-step ICI traffic drops k-fold. Edge
            # bounce-back runs in-kernel (flagged by mesh position);
            # no external fixup (inner steps are invisible out here).
            iy_m = jax.lax.axis_index("y")
            ix_m = jax.lax.axis_index("x")
            edges = jnp.stack(
                [iy_m == 0, iy_m == ny_sh - 1, ix_m == 0, ix_m == nx_sh - 1]
            ).astype(jnp.int32)
            fnew = pallas_lbm.fused_step_fluid_multi(
                f_ext, local_cfg, temporal_k, prehalo=prehalo, edges=edges,
                out_buf=f_scratch,
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

        fnew = fix_y_walls(fnew, col(f[:, 0:1, :]), col(f[:, -1:, :]))
        if two_d:
            fnew = fix_x_walls(fnew, col(f[:, :, 0:1]), col(f[:, :, -1:]))
        # Zou/He open boundaries (no-op unless bc_west == 'inlet'; the
        # fixup is storage-aware: bf16 fnew holds shifted g and the
        # closures run in f32 with the +rho0 density-sum shift)
        fnew = _apply_open_boundaries_sharded(fnew, cfg, h, nx_sh)
        return state._replace(f=fnew, step=state.step + 1)

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
