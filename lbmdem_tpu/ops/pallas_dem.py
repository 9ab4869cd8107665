"""Pallas DEM subcycle: the whole n_sub velocity-Verlet cycle on-chip.

The XLA subcycle (ops/dem.py) spends its time in per-substep row
gathers (partner state changes every substep). This kernel removes
gathers entirely with a *slab* layout:

- Disks are slotted into a dense (K, ncy, ncx) grid of broadphase cells
  (rank-major planes), built once per LBM step from the existing cell
  table. Cells are >= 2 r_max + skin wide, so every possibly-touching
  partner of a disk lies in the 3x3 cell patch = the same plane set
  shifted by (dy, dc) - uniform shifts, no gathers.
- All state planes live in VMEM for the whole subcycle; each substep
  evaluates 3*3*K - 1 partner planes per rank with rolled+masked
  shifts, adds wall/hydro/body forces, and integrates velocity-Verlet.
- Empty slots carry r = 0 (inactive); self-pairs are excluded
  statically.

Scope: kt == 0 (tangential dashpot friction). The history-spring path
(kt > 0) falls back to the XLA subcycle, which remains the oracle for
parity tests either way.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lbmdem_tpu.config import SimConfig, WALL
from lbmdem_tpu.ops import dem as dem_ops
from lbmdem_tpu.ops.dem import DemGrid, DiskState


def _interpret() -> bool:
    from lbmdem_tpu.ops.pallas_stamp import _interpret as f

    return f()


SLAB_K = 4  # slots per broadphase cell (cells hold <= ~2 disks of r_max)

# state plane channels
_X, _Y, _VX, _VY, _OM, _TH, _R, _FHX, _FHY, _THQ = range(10)
_NCH = 10


def slab_supported(grid: DemGrid, n: int) -> bool:
    """Feasibility gate: VMEM for ~10 f32 rank-plane sets, and a plane
    size cap. Qualified on TPU v5e up to 241x256 planes (4096^2 domains
    at cell_size 17): Mosaic compile 74 s, bit-exact vs the XLA oracle.
    The cap tracks the largest *verified* compile, scaled ~1.3x."""
    ncxp = -(-grid.ncx // 128) * 128
    if grid.ncy * ncxp > 80000:
        return False
    bytes_ = _NCH * SLAB_K * grid.ncy * ncxp * 4
    return bytes_ <= 48 * 2**20


def build_slabs(
    disks: DiskState, f_hydro, t_hydro, body_f, grid: DemGrid
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """(slabs (NCH, K, ncy, ncxp) f32, slot_of_disk (N,) i32, overflow,
    kmax () i32 - max occupied rank + 1, bounds the kernel rank loops).

    Inactive/empty slots get r = 0 and positions far outside the domain.
    """
    n = disks.x.shape[0]
    ncxp = -(-grid.ncx // 128) * 128
    ncells = grid.ncy * grid.ncx

    cid = dem_ops._cell_ids(disks.x, disks.active, grid)
    iota = jnp.arange(n, dtype=jnp.int32)
    scid, order = jax.lax.sort((cid, iota), num_keys=1)
    is_start = jnp.concatenate([jnp.ones((1,), bool), scid[1:] != scid[:-1]])
    first = jax.lax.cummax(jnp.where(is_start, iota, 0))
    rank = iota - first
    valid = (scid >= 0) & (rank < SLAB_K)
    # max occupied rank + 1: ranks are contiguous from 0 within a cell,
    # so the kernel can bound both rank loops by this scalar (cells
    # rarely hold >2 disks; pair work scales with kmax^2, not SLAB_K^2)
    kmax = jnp.clip(jnp.max(jnp.where(valid, rank, -1)) + 1, 0, SLAB_K)
    # slot layout: (k, cy, cx) -> k * (ncy*ncxp) + cy * ncxp + cx
    cy = scid // grid.ncx
    cx = scid - cy * grid.ncx
    slot = rank * (grid.ncy * ncxp) + cy * ncxp + cx
    slot = jnp.where(valid, slot, SLAB_K * grid.ncy * ncxp)
    overflow = jnp.sum((scid >= 0) & (rank >= SLAB_K)).astype(jnp.int32)
    slot_of_disk = (
        jnp.full((n,), -1, jnp.int32)
        .at[order]
        .set(jnp.where(valid, slot, -1).astype(jnp.int32))
    )

    f32 = jnp.float32
    f_hydro = jnp.broadcast_to(f_hydro, (n, 2))
    t_hydro = jnp.broadcast_to(t_hydro, (n,))
    body_f = jnp.broadcast_to(body_f, (n, 2))
    far = jnp.where(disks.active, 0.0, 1e6).astype(f32)
    fields = [
        disks.x[:, 0].astype(f32) + far,
        disks.x[:, 1].astype(f32) - far,
        disks.v[:, 0].astype(f32),
        disks.v[:, 1].astype(f32),
        disks.omega.astype(f32),
        disks.theta.astype(f32),
        jnp.where(disks.active, disks.r, 0.0).astype(f32),
        (f_hydro[:, 0] + body_f[:, 0]).astype(f32),
        (f_hydro[:, 1] + body_f[:, 1]).astype(f32),
        t_hydro.astype(f32),
    ]
    nslots = SLAB_K * grid.ncy * ncxp
    sdisk = order.astype(jnp.int32)
    # ONE row-scatter of (n, NCH) packed rows instead of NCH scalar
    # scatters: XLA scatter serializes per call on TPU (~ms each at 10k
    # rows), so channel-packed rows cut the build ~NCH-fold.
    packed = jnp.stack(fields, axis=1)[sdisk]  # (n, NCH), slot-ordered
    dense = (
        jnp.zeros((nslots, _NCH), f32)
        .at[jnp.where(valid, slot, nslots)]
        .set(packed, mode="drop")
    )
    slabs = dense.T.reshape(_NCH, SLAB_K, grid.ncy, ncxp)
    return slabs, slot_of_disk, overflow, kmax.astype(jnp.int32)


def _shift2(a, dy, dc, ncy, ncx):
    """a rolled by (dy, dc) with out-of-grid rows/cols masked invalid
    (returns shifted array; caller masks via the partner's r)."""
    if dy:
        a = pltpu.roll(a, (-dy) % a.shape[0], 0)
    if dc:
        a = pltpu.roll(a, (-dc) % a.shape[1], 1)
    return a


def _dem_kernel(kmax_ref, s_ref, out_ref, *, cfg: SimConfig, grid: DemGrid,
                ncxp: int):
    K = SLAB_K
    ncy = grid.ncy
    h = np.float32(1.0 / cfg.n_sub)
    kn, gn, gt, mu = (np.float32(cfg.kn), np.float32(cfg.gamma_n),
                      np.float32(cfg.gamma_t), np.float32(cfg.mu))
    rho_pi = np.float32(cfg.rho_s * np.pi)

    row = jax.lax.broadcasted_iota(jnp.int32, (ncy, ncxp), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (ncy, ncxp), 1)

    def edge_ok(dy, dc):
        ok = col + dc < grid.ncx  # also masks the ncx..ncxp padding
        if dy > 0:
            ok &= row < ncy - dy
        if dy < 0:
            ok &= row >= -dy
        if dc > 0:
            pass  # covered above
        if dc < 0:
            ok &= col >= -dc
        return ok

    walls = [
        (cfg.bc_west == WALL, -0.5, 0, False),
        (cfg.bc_east == WALL, cfg.nx - 0.5, 0, False),
        (cfg.bc_south == WALL, -0.5, 1, True),
        (cfg.bc_north == WALL, cfg.ny - 0.5, 1, True),
    ]

    def pair(xi, yi, vxi, vyi, omi, ri, xj, yj, vxj, vyj, omj, rj, extra_ok,
             j_act=None):
        dx = xi - xj
        dyv = yi - yj
        dist = jnp.sqrt(dx * dx + dyv * dyv)
        dist = jnp.maximum(dist, np.float32(1e-12))
        delta = ri + rj - dist
        j_ok = (rj > 0) if j_act is None else j_act
        touching = extra_ok & (delta > 0) & (ri > 0) & j_ok
        inv = 1.0 / dist
        nx_, ny_ = dx * inv, dyv * inv
        tx_, ty_ = -ny_, nx_
        li = ri - 0.5 * delta
        lj = rj - 0.5 * delta
        larm = omi * li + omj * lj
        vrx = vxi - vxj - larm * tx_
        vry = vyi - vyj - larm * ty_
        vn = vrx * nx_ + vry * ny_
        vt = vrx * tx_ + vry * ty_
        fn = kn * delta - gn * vn
        cap = mu * jnp.abs(fn)
        ft = jnp.clip(-gt * vt, -cap, cap)
        fn = jnp.where(touching, fn, 0.0)
        ft = jnp.where(touching, ft, 0.0)
        return (fn * nx_ + ft * tx_, fn * ny_ + ft * ty_, -li * ft, touching)

    kmax = kmax_ref[0]

    def forces(state_ref, X, Y, VX, VY, OM, R):
        # partners are read from state_ref planes (dynamic rank index
        # k2 via fori_loop keeps the unroll at 9 pair bodies instead of
        # 9*K^2 - Mosaic compile time blows up otherwise). Both rank
        # loops are bounded by the step's max occupied rank (kmax):
        # outer rank k >= kmax gets a zero-trip inner loop, so pair work
        # scales with kmax^2 (cells rarely hold > 2 disks).
        Fx = [None] * K
        Fy = [None] * K
        Tq = [None] * K
        NC = None
        for k in range(K):
            fx = jnp.zeros((ncy, ncxp), jnp.float32)
            fy = jnp.zeros_like(fx)
            tq = jnp.zeros_like(fx)
            nc = jnp.zeros_like(fx)
            trip = jnp.where(k < kmax, kmax, 0)
            for dy in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    ok = edge_ok(dy, dc)
                    same_cell = dy == 0 and dc == 0

                    def inner(k2, acc, dy=dy, dc=dc, ok=ok,
                              same_cell=same_cell, k=k):
                        afx, afy, atq, anc = acc
                        sh = lambda ch: _shift2(
                            state_ref[ch, k2], dy, dc, ncy, grid.ncx
                        )
                        okk = ok
                        if same_cell:
                            okk = ok & (k2 != k)
                        dfx, dfy, dtq, tt = pair(
                            X[k], Y[k], VX[k], VY[k], OM[k], R[k],
                            sh(_X), sh(_Y), sh(_VX), sh(_VY),
                            sh(_OM), sh(_R), okk,
                        )
                        return (afx + dfx, afy + dfy, atq + dtq,
                                anc + tt.astype(jnp.float32))

                    fx, fy, tq, nc = jax.lax.fori_loop(
                        0, trip, inner, (fx, fy, tq, nc)
                    )

            # walls: mirror disk of radius 0 on the plane (skipped for
            # ranks >= kmax via a 0/1-trip loop; planes there are empty)
            def wall_forces(_, acc, k=k):
                afx, afy, atq = acc
                for on, wpos, axis, horizontal in walls:
                    if not on:
                        continue
                    if axis == 0:
                        xj, yj = jnp.full_like(X[k], np.float32(wpos)), Y[k]
                    else:
                        xj, yj = X[k], jnp.full_like(Y[k], np.float32(wpos))
                    zero = jnp.zeros_like(X[k])
                    dfx, dfy, dtq, _ = pair(
                        X[k], Y[k], VX[k], VY[k], OM[k], R[k],
                        xj, yj, zero, zero, zero, zero,
                        jnp.ones_like(row, dtype=bool), j_act=True,
                    )
                    afx = afx + dfx
                    afy = afy + dfy
                    atq = atq + dtq
                return (afx, afy, atq)

            fx, fy, tq = jax.lax.fori_loop(
                0, jnp.where(k < kmax, 1, 0), wall_forces, (fx, fy, tq)
            )
            Fx[k], Fy[k], Tq[k] = fx, fy, tq
            NC = nc if NC is None else NC + nc
        return Fx, Fy, Tq, NC

    # state lives IN the (aliased) output ref: each substep reads the
    # planes it needs and writes the updated ones back, keeping the
    # VMEM live set to one substep's temporaries (carrying 40 planes
    # through fori_loop blew the Mosaic stack).
    R = [s_ref[_R, k] for k in range(K)]
    FHX = [s_ref[_FHX, k] for k in range(K)]
    FHY = [s_ref[_FHY, k] for k in range(K)]
    THQ = [s_ref[_THQ, k] for k in range(K)]
    inv_m = [
        jnp.where(R[k] > 0, 1.0 / (rho_pi * R[k] * R[k]), 0.0) for k in range(K)
    ]
    inv_i = [
        jnp.where(R[k] > 0, inv_m[k] * 2.0 / jnp.maximum(R[k] * R[k], 1e-12), 0.0)
        for k in range(K)
    ]
    act = [(R[k] > 0).astype(jnp.float32) for k in range(K)]

    def total(X, Y, VX, VY, OM):
        # callers guarantee state_ref (= out_ref) holds exactly
        # (X, Y, VX, VY, OM) before calling
        Fx, Fy, Tq, NC = forces(out_ref, X, Y, VX, VY, OM, R)
        for k in range(K):
            Fx[k] = (Fx[k] + FHX[k]) * act[k]
            Fy[k] = (Fy[k] + FHY[k]) * act[k]
            Tq[k] = (Tq[k] + THQ[k]) * act[k]
        return Fx, Fy, Tq, NC

    def rd(ch):
        return [out_ref[ch, k] for k in range(K)]

    def wr(ch, planes):
        for k in range(K):
            out_ref[ch, k] = planes[k]

    for ch in (_X, _Y, _VX, _VY, _OM, _TH):
        wr(ch, [s_ref[ch, k] for k in range(K)])
    for k in range(K):
        out_ref[_R, k] = R[k]

    # one force eval per substep, forces carried across substeps (same
    # ordering as the XLA oracle: F2 is computed with (x_new, v_half))
    Fx0, Fy0, Tq0, _ = total(rd(_X), rd(_Y), rd(_VX), rd(_VY), rd(_OM))

    def body(_, carry):
        Fx, Fy, Tq, nc_carry = carry
        X, Y = rd(_X), rd(_Y)
        VX, VY, OM = rd(_VX), rd(_VY), rd(_OM)
        TH = rd(_TH)
        VXh = [VX[k] + (0.5 * h) * Fx[k] * inv_m[k] for k in range(K)]
        VYh = [VY[k] + (0.5 * h) * Fy[k] * inv_m[k] for k in range(K)]
        OMh = [OM[k] + (0.5 * h) * Tq[k] * inv_i[k] for k in range(K)]
        X = [X[k] + h * VXh[k] * act[k] for k in range(K)]
        Y = [Y[k] + h * VYh[k] * act[k] for k in range(K)]
        TH = [TH[k] + h * OMh[k] * act[k] for k in range(K)]
        # publish (x_new, v_half) so the force eval reads them
        wr(_X, X)
        wr(_Y, Y)
        wr(_TH, TH)
        wr(_VX, VXh)
        wr(_VY, VYh)
        wr(_OM, OMh)
        Fx2, Fy2, Tq2, NC2 = total(X, Y, VXh, VYh, OMh)
        wr(_VX, [(VXh[k] + (0.5 * h) * Fx2[k] * inv_m[k]) * act[k] for k in range(K)])
        wr(_VY, [(VYh[k] + (0.5 * h) * Fy2[k] * inv_m[k]) * act[k] for k in range(K)])
        wr(_OM, [(OMh[k] + (0.5 * h) * Tq2[k] * inv_i[k]) * act[k] for k in range(K)])
        return (Fx2, Fy2, Tq2, jnp.maximum(nc_carry, NC2))

    _, _, _, NC = jax.lax.fori_loop(
        0, cfg.n_sub, body,
        (Fx0, Fy0, Tq0, jnp.zeros((ncy, ncxp), jnp.float32)),
    )
    out_ref[_FHX, 0] = NC / jnp.float32(2.0)  # touching count (directed/2)
    for k in range(1, K):
        out_ref[_FHX, k] = jnp.zeros_like(NC)
    for k in range(K):
        out_ref[_FHY, k] = jnp.zeros_like(NC)
        out_ref[_THQ, k] = jnp.zeros_like(NC)


def dem_subcycle(
    disks: DiskState, f_hydro, t_hydro, grid: DemGrid, cfg: SimConfig
) -> Tuple[DiskState, jax.Array, jax.Array]:
    """Drop-in Pallas replacement for ops.dem.dem_subcycle (kt == 0)."""
    assert cfg.kt == 0.0, "history springs use the XLA subcycle"
    ncxp = -(-grid.ncx // 128) * 128
    body_f = dem_ops.body_forces(disks, cfg)
    slabs, slot, overflow, kmax = build_slabs(
        disks, f_hydro, t_hydro, body_f, grid
    )
    kernel = functools.partial(_dem_kernel, cfg=cfg, grid=grid, ncxp=ncxp)
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(slabs.shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
        input_output_aliases={1: 0},
        interpret=_interpret(),
    )(kmax.reshape(1), slabs)
    # one row-gather back to disk order; only the 6 integrated state
    # channels (_X.._TH) leave slab layout - the force/NC channels are
    # consumed in place, so the transpose moves 40% less
    flat_t = out[:6].reshape(6, -1).T  # (nslots, 6)
    ok = slot >= 0
    g = flat_t[jnp.maximum(slot, 0)]  # (N, NCH)
    dt = disks.x.dtype

    def pick(ch, old):
        v = g[:, ch].astype(dt)
        return jnp.where(ok & disks.active, v, old)

    new = disks._replace(
        x=jnp.stack([pick(_X, disks.x[:, 0]), pick(_Y, disks.x[:, 1])], 1),
        v=jnp.stack([pick(_VX, disks.v[:, 0]), pick(_VY, disks.v[:, 1])], 1),
        omega=pick(_OM, disks.omega),
        theta=pick(_TH, disks.theta),
    )
    nc = jnp.sum(out[_FHX], dtype=jnp.float32).astype(jnp.int32)
    return new, overflow, nc
