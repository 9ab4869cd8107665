"""Pallas DEM subcycle: the whole n_sub velocity-Verlet cycle on-chip,
banded over OCCUPIED broadphase-cell strips.

The XLA subcycle (ops/dem.py) spends its time in per-substep row
gathers (partner state changes every substep). This kernel removes
gathers entirely with a *slab* layout:

- Disks are slotted into a dense (K, R, C) grid of broadphase cells
  (rank-major planes), built once per LBM step from the existing cell
  table. Cells are >= 2 r_max + skin wide, so every possibly-touching
  partner of a disk lies in the 3x3 cell patch = the same plane set
  shifted by (dy, dc) - uniform shifts, no gathers.
- All state planes live in VMEM for the whole subcycle; empty slots
  carry r = 0 (inactive); self-pairs are excluded statically.

Occupancy banding (the round-2 upgrade): real scenes are spatially
sparse - the headline column collapse covers ~22% of the domain's x
extent - so whole-plane substeps waste most of their vector work on
empty cells.  Instead of plane-wide ops, every phase (force eval,
kick+drift, second kick) is a `fori_loop` over just the *occupied*
8-sublane bands, driven by a band table built with the binning (an
SMEM list of row offsets + a count). State stays globally consistent
in one VMEM buffer, so there is NO halo redundancy and no n_sub-deep
halo: a band's force eval reads its +-8-row window in place, and bands
with no disks are never touched (their slots pass through unchanged via
input/output aliasing).  Because the sublane axis is the banded one,
`build_slabs` can lay the planes out with either lattice axis as
sublanes (`axis='x'` transposes) so the SPARSE axis gets the 8-cell
banding granularity - the caller picks the axis from the initial disk
extents (see choose_axis).

Tangential friction: both the dashpot law (kt == 0) and the Cundall-
Strack history spring (kt > 0) run in-kernel. The spring state rides
the slab itself: a contact between the disk at slot (k, s, l) and the
partner at (k2, s+dy, l+dc) is a FIXED (dy, dc, k2) relation for the
whole subcycle (slab assignment never changes mid-subcycle), so each
rank gets 9*SLAB_K extra xi channels (one per partner slot) plus 4
wall-spring channels, advanced in place by every force eval exactly
like the oracle's per-candidate-slot xi. Across LBM steps the springs
are re-matched by partner id through DiskState.ct_j/ct_xi (the same
(N, contact_cap) carry the XLA subcycle uses, so the two paths
interoperate mid-run); see ops/dem.py:440-447 for the rematch oracle.
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

# state plane channels. _MINV carries 1/mass per slot: 0.0 for fixed
# (infinite-mass) disks - kicks vanish, the drift keeps the prescribed
# v/omega - and the true per-disk inverse mass otherwise, so per-disk
# densities (DiskSpec.rho_s) ride the same channel; inertia follows as
# 1/I = (1/m) * 2/r^2.
_X, _Y, _VX, _VY, _OM, _TH, _R, _FHX, _FHY, _THQ, _MINV = range(11)
_NCH = 11
# kt > 0 appends per-rank spring channels: 9*SLAB_K pair-xi channels
# (channel _XI0 + dir_idx*SLAB_K + k2 holds rank k's stretch vs the
# (dy, dc) = dir partner of rank k2; dir_idx = (dy+1)*3 + (dc+1)) and
# 4 wall-xi channels (W/E/S/N order, matching DiskState.wall_xi).
_XI0 = _NCH
_NXI = 9 * SLAB_K
_XIW = _XI0 + _NXI
_NCH_KT = _XIW + 4


def slab_dims(grid: DemGrid, axis: str) -> Tuple[int, int, int, int, int]:
    """(ncs, ncl, R, C, nb): sublane/lane cell counts, padded plane rows
    (8-row empty guard bands top+bottom so +-1-row windows never leave
    the array), padded lane count, and the number of 8-row bands."""
    ncs, ncl = (grid.ncy, grid.ncx) if axis == "y" else (grid.ncx, grid.ncy)
    C = -(-ncl // 128) * 128
    ncs_pad = -(-ncs // 8) * 8
    return ncs, ncl, ncs_pad + 16, C, ncs_pad // 8


def choose_axis(disks, cfg: SimConfig) -> str:
    """Pick the slab sublane axis so the axis with the SMALLER relative
    initial disk extent gets the 8-cell occupancy banding (e.g. the
    column-collapse column spans 22% of x but 90% of y -> axis='x')."""
    if not disks:
        return "y"
    xs = [d.x for d in disks]
    ys = [d.y for d in disks]
    span_x = (max(xs) - min(xs)) / max(cfg.nx, 1)
    span_y = (max(ys) - min(ys)) / max(cfg.ny, 1)
    return "x" if span_x < span_y else "y"


def _wrap_sl(grid: DemGrid, axis: str) -> Tuple[float, float]:
    """(sublane, lane) wrap lengths of the slab orientation (0 = walls)."""
    return ((grid.wrap_ly, grid.wrap_lx) if axis == "y"
            else (grid.wrap_lx, grid.wrap_ly))


def slab_supported(grid: DemGrid, axis: str = "y", kt: bool = False) -> bool:
    """Feasibility gate: VMEM for the state planes + force scratch, and
    a plane-size cap tracking the largest *verified* Mosaic compile
    (qualified on TPU v5e up to 504x512 planes = 8192^2 domains at
    cell_size 17: 33 s kernel compile, 1333 MLUPS/chip coupled,
    tools/qualify_8192.py).

    Periodic axes are supported in-kernel (minimum-image pair law +
    wrapped adjacency: ghost guard rows on a wrapped sublane axis,
    roll-wrapped partner lanes on a wrapped lane axis); a wrapped
    sublane axis needs >= 8 cell rows so the 8-row ghost copies are
    whole real rows.

    kt = True budgets the history-spring channels (_NCH_KT vs _NCH:
    +40 planes per rank), so spring scenes fall back to the XLA
    subcycle ~4.6x earlier in plane area."""
    ncs, ncl, R, C, nb = slab_dims(grid, axis)
    wrap_s, _ = _wrap_sl(grid, axis)
    if wrap_s and ncs < 8:
        return False
    if R * C > 270000:
        return False
    nch = _NCH_KT if kt else _NCH
    bytes_ = (nch * SLAB_K + 3 * SLAB_K + 1) * R * C * 4
    # kt budgets half the kt=0 bound: the spring channels are kernel
    # OUTPUTS too, and input_output_aliases is a buffer donation, not a
    # VMEM-aliasing guarantee - Mosaic may stage the output separately,
    # so leave 2x headroom under the 100 MB scoped-VMEM limit.
    return bytes_ <= (48 if kt else 72) * 2**20


def _partner_ids(slot, n, grid: DemGrid, axis: str):
    """(N, _NXI) partner disk ids for each (dy, dc, k2) slab slot of
    each disk (-1 = empty/out-of-grid/self), ordered dir_idx*K + k2 to
    match the kernel's xi channel layout. Wrapped axes use modular
    adjacency (cells exactly tile wrapped axes - DemGrid.build)."""
    ncs, ncl, R, C, _ = slab_dims(grid, axis)
    wrap_s, wrap_l = _wrap_sl(grid, axis)
    nslots = SLAB_K * R * C
    iota = jnp.arange(n, dtype=jnp.int32)
    dos = (
        jnp.full((nslots + 1,), -1, jnp.int32)
        .at[jnp.where(slot >= 0, slot, nslots)]
        .set(jnp.where(slot >= 0, iota, -1))
    )
    p = jnp.maximum(slot, 0)
    k_i = p // (R * C)
    rem = p - k_i * (R * C)
    row = rem // C - 8  # real cell row (strip the guard-band offset)
    lane = rem - (rem // C) * C
    cols = []
    for dy in (-1, 0, 1):
        rs = row + dy
        if wrap_s:
            rs = jax.lax.rem(rs + ncs, jnp.int32(ncs))
            ok_y = jnp.ones_like(rs, dtype=bool)
        else:
            ok_y = (rs >= 0) & (rs < ncs)
        for dc in (-1, 0, 1):
            ls = lane + dc
            if wrap_l:
                ls = jax.lax.rem(ls + ncl, jnp.int32(ncl))
                ok = ok_y
            else:
                ok = ok_y & (ls >= 0) & (ls < ncl)
            base = (rs + 8) * C + ls
            for k2 in range(SLAB_K):
                ps = jnp.where(ok & (slot >= 0), k2 * (R * C) + base,
                               nslots)
                if dy == 0 and dc == 0:
                    ps = jnp.where(k_i == k2, nslots, ps)
                cols.append(ps)
    j36 = dos[jnp.stack(cols, axis=1)]  # (N, _NXI), one gather
    return j36


def _rematch_xi(j36, ct_j, ct_xi):
    """Re-match carried springs to the fresh slab partner slots by
    partner id (oracle: ops/dem.py dem_subcycle's `same` mask)."""
    same = (
        (j36[:, :, None] == ct_j[:, None, :])
        & (ct_j[:, None, :] >= 0)
        & (j36[:, :, None] >= 0)
    )
    return jnp.sum(
        jnp.where(same, ct_xi[:, None, :].astype(jnp.float32), 0.0), axis=2
    )


def build_slabs(
    disks: DiskState, f_hydro, t_hydro, body_f, grid: DemGrid,
    axis: str = "y", kt: bool = False, bake_forces: bool = True,
):
    """(slabs (NCH, K, R, C) f32, slot_of_disk (N,) i32, overflow,
    kmax () i32 - max occupied rank + 1, bounding the kernel rank loops,
    n_occ () i32 and band_offs (nb,) i32 - the occupancy band table:
    the first n_occ entries are the plane-row offsets of the occupied
    8-row bands, ascending - and j36: the (N, _NXI) partner-id map when
    kt (slabs then carry _NCH_KT channels: rematched pair springs +
    wall springs), else None.

    Inactive disks never reach the slabs (their cell id is -1, so the
    packed scatter drops them); empty slots hold all-zero rows.  Every
    pair/wall evaluation therefore MUST mask on r > 0 — an all-zero
    slot sits at the origin, not outside the domain.
    """
    n = disks.x.shape[0]
    ncs, ncl, R, C, nb = slab_dims(grid, axis)

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
    cy = scid // grid.ncx
    cx = scid - cy * grid.ncx
    cs, cl = (cy, cx) if axis == "y" else (cx, cy)
    # slot layout: (k, s, l) -> k * (R*C) + (s + 8) * C + l
    slot = rank * (R * C) + (cs + 8) * C + cl
    slot = jnp.where(valid, slot, SLAB_K * R * C)
    overflow = jnp.sum((scid >= 0) & (rank >= SLAB_K)).astype(jnp.int32)
    slot_of_disk = (
        jnp.full((n,), -1, jnp.int32)
        .at[order]
        .set(jnp.where(valid, slot, -1).astype(jnp.int32))
    )

    # occupancy band table: which 8-row strips hold any disk. nb is
    # small (<= ~64), so a dense one-hot any() beats a scatter (XLA
    # scatter serializes on TPU).
    band = cs // 8
    bids = jnp.arange(nb, dtype=jnp.int32)
    occ = jnp.any((band[None, :] == bids[:, None]) & valid[None, :], axis=1)
    n_occ = jnp.sum(occ).astype(jnp.int32)
    band_offs = jax.lax.sort(jnp.where(occ, bids * 8 + 8, R).astype(jnp.int32))

    f32 = jnp.float32
    f_hydro = jnp.broadcast_to(f_hydro, (n, 2))
    t_hydro = jnp.broadcast_to(t_hydro, (n,))
    body_f = jnp.broadcast_to(body_f, (n, 2))
    fields = [
        disks.x[:, 0].astype(f32),
        disks.x[:, 1].astype(f32),
        disks.v[:, 0].astype(f32),
        disks.v[:, 1].astype(f32),
        disks.omega.astype(f32),
        disks.theta.astype(f32),
        jnp.where(disks.active, disks.r, 0.0).astype(f32),
    ]
    if bake_forces:
        fields.extend([
            (f_hydro[:, 0] + body_f[:, 0]).astype(f32),
            (f_hydro[:, 1] + body_f[:, 1]).astype(f32),
            t_hydro.astype(f32),
        ])
    # bake_forces=False (the coupling-cadence window driver): the
    # kernel reads per-inner-step (3, K, R, C) force planes instead, so
    # the _FHX/_FHY/_THQ channels would be dead weight - dropping them
    # cuts the slab tensor (and its staged Mosaic output copy) by 3/11,
    # which is what keeps the 8192^2 coupling_k window kernel under the
    # ~100 MB scoped-VMEM limit (r4 bench OOMed at 110.93M with them).
    # _MINV then sits at channel 7 and springs start at 8 (slim layout).
    fields.append(jnp.where(
        disks.mobile & disks.active, 1.0 / disks.mass, 0.0
    ).astype(f32))
    j36 = None
    if kt:
        j36 = _partner_ids(slot_of_disk, n, grid, axis)
        xi0 = _rematch_xi(j36, disks.ct_j, disks.ct_xi)
        fields.extend(xi0[:, c] for c in range(_NXI))
        fields.extend(disks.wall_xi[:, c].astype(f32) for c in range(4))
    nslots = SLAB_K * R * C
    sdisk = order.astype(jnp.int32)
    # ONE channel-batched column scatter straight into the final
    # (NCH, nslots) layout. Channel-packed updates keep it a single
    # scatter call (XLA scatter serializes per call on TPU, ~ms each at
    # 10k rows), and scattering columns of the channel-major target
    # skips both the (nslots, NCH) intermediate - whose 10-element minor
    # dim is lane-padded to 128, a ~13x HBM footprint - and the big
    # transpose after it: measured 1.37 -> 0.63 ms at 4096^2/10k.
    nch = len(fields)  # _NCH, or _NCH_KT with springs
    packed = jnp.stack(fields, axis=0)[:, sdisk]  # (nch, n), slot-ordered
    dense = (
        jnp.zeros((nch, nslots), f32)
        .at[:, jnp.where(valid, slot, nslots)]
        .set(packed, mode="drop")
    )
    slabs = dense.reshape(nch, SLAB_K, R, C)
    return (slabs, slot_of_disk, overflow, kmax.astype(jnp.int32), n_occ,
            band_offs, j36)


def _dem_kernel(kmax_ref, nocc_ref, bands_ref, s_ref, out_ref, nc_ref, fscr,
                *, cfg: SimConfig, ncs: int, ncl: int, R: int, C: int,
                wrap_s: float = 0.0, wrap_l: float = 0.0, force_ref=None,
                slim: bool = False):
    """wrap_s/wrap_l: periodic wrap lengths of the sublane/lane axes
    (0 = walls on that axis). Wrapped-axis mechanics, mirroring the
    XLA oracle (ops/dem.py wrapped 3x3 adjacency + _min_image):
    - the pair law takes minimum-image displacements, so partner
      coordinates can stay RAW (no +-L shifting of ghost copies);
    - lane adjacency wraps via a roll+select fix on the dc = +-1
      partner slices (lane j reads p[(j+dc) mod ncl] within the
      128-padded plane width);
    - sublane adjacency wraps via ghost copies of the 8 edge rows into
      the guard bands, refreshed after every kick+drift
      (_refresh_wrap_rows).

    kt > 0: the spring channels (_XI0.., _XIW..) ride out_ref and are
    advanced IN PLACE by every per-substep force eval (the initial eval
    reads but never writes them - the oracle discards its h=0 xi2,
    ops/dem.py:459). xi slots are indexed by the i-side disk's rows, so
    neither wrap ghosts nor band windows touch them."""
    # slim layout (window driver, bake_forces=False): no _FHX/_FHY/_THQ
    # channels - _MINV sits at 7, springs at 8; forces come from
    # force_ref only
    assert not slim or force_ref is not None
    ch_minv = 7 if slim else _MINV
    ch_xi0 = 8 if slim else _XI0
    ch_xiw = ch_xi0 + _NXI
    K = SLAB_K
    h = np.float32(1.0 / cfg.n_sub)
    kn, gn, gt, mu = (np.float32(cfg.kn), np.float32(cfg.gamma_n),
                      np.float32(cfg.gamma_t), np.float32(cfg.mu))
    ktc = np.float32(cfg.kt)
    kt_on = cfg.kt > 0.0
    kmax = kmax_ref[0]
    nocc = nocc_ref[0]
    # lattice-frame wrap lengths for the minimum image (pair() works in
    # lattice x/y whatever the slab orientation)
    wlx = np.float32(cfg.wrap_lx)
    wly = np.float32(cfg.wrap_ly)

    col = jax.lax.broadcasted_iota(jnp.int32, (8, C), 1)
    oks = {}
    for dc in (-1, 0, 1):
        if wrap_l:
            # every real lane has a (wrapped) partner; padding lanes
            # carry r == 0 on the i side, which pair() masks
            oks[dc] = col < ncl
            continue
        ok = col + dc < ncl  # also masks the ncl..C lane padding
        if dc < 0:
            ok = ok & (col >= -dc)
        oks[dc] = ok

    walls = [
        (0, cfg.bc_west == WALL, -0.5, 0),
        (1, cfg.bc_east == WALL, cfg.nx - 0.5, 0),
        (2, cfg.bc_south == WALL, -0.5, 1),
        (3, cfg.bc_north == WALL, cfg.ny - 0.5, 1),
    ]

    def pair(xi, yi, vxi, vyi, omi, ri, xj, yj, vxj, vyj, omj, rj, extra_ok,
             j_act=None, min_image=True, spring=None, adv=None):
        """spring/adv (kt > 0): the carried tangential stretch and the
        advance step (0 for the initial eval). The 5th return is the
        slip-consistently truncated new stretch (oracle:
        dem._pair_force's xi_new), or None when kt == 0."""
        dx = xi - xj
        dyv = yi - yj
        # minimum image on wrapped axes (oracle: dem._min_image); wall
        # mirror contacts pass min_image=False (the mirror point is
        # always the true nearest boundary)
        if min_image and wlx:
            dx = dx - wlx * jnp.round(dx / wlx)
        if min_image and wly:
            dyv = dyv - wly * jnp.round(dyv / wly)
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
        xi_new = None
        if spring is not None:
            xi_t = jnp.where(touching, spring + vt * adv, 0.0)
            ft = jnp.clip(-ktc * xi_t - gt * vt, -cap, cap)
            xi_new = jnp.where(touching, -(ft + gt * vt) / ktc, 0.0)
        else:
            ft = jnp.clip(-gt * vt, -cap, cap)
        fn = jnp.where(touching, fn, 0.0)
        ft = jnp.where(touching, ft, 0.0)
        return (fn * nx_ + ft * tx_, fn * ny_ + ft * ty_, -li * ft, touching,
                xi_new)

    def rd(ch, k, off):
        return out_ref[ch, k, pl.ds(off, 8)]

    # Initialize out_ref = input explicitly: input_output_aliases is an
    # XLA *buffer* donation, NOT a guarantee that the kernel's VMEM
    # output window starts with the input values - Mosaic may stage the
    # output in a fresh buffer (observed at 8192^2-class planes: the
    # unwritten rows came back zero). If Mosaic does alias in place the
    # copy folds to a no-op read-write of the same VMEM.
    out_ref[...] = s_ref[...]

    def refresh_wrap_rows():
        """Wrapped sublane axis: copy the 8 real edge rows into the
        guard bands so the +-1-row windows see the far side (raw
        coordinates; the pair law applies the minimum image). The
        bottom target [0, 8) is 8-aligned; the top target starts at
        plane row 8+ncs, which for ncs % 8 != 0 goes through an aligned
        16-row read-modify-write (static offsets throughout)."""
        lo_src = ncs  # plane row 8 + ncs - 8 of the last 8 real rows
        a0 = (lo_src // 8) * 8
        d_lo = lo_src - a0
        hi_dst = 8 + ncs
        t0 = (hi_dst // 8) * 8
        d_hi = hi_dst - t0
        for ch in (_X, _Y, _VX, _VY, _OM, _R):
            for k in range(K):
                v = out_ref[ch, k, pl.ds(a0, 16)]
                out_ref[ch, k, pl.ds(0, 8)] = jax.lax.slice(
                    v, (d_lo, 0), (d_lo + 8, C)
                )
                first8 = out_ref[ch, k, pl.ds(8, 8)]
                if d_hi == 0:
                    out_ref[ch, k, pl.ds(t0, 8)] = first8
                else:
                    w = out_ref[ch, k, pl.ds(t0, 16)]
                    out_ref[ch, k, pl.ds(t0, 16)] = jnp.concatenate(
                        [jax.lax.slice(w, (0, 0), (d_hi, C)), first8,
                         jax.lax.slice(w, (d_hi + 8, 0), (16, C))], axis=0
                    )

    if wrap_s:
        refresh_wrap_rows()

    # --- per-band phases (state lives IN out_ref; rows of untouched
    # bands pass through as the just-copied input) ---

    def make_band_force(adv, write_xi):
        """Band force-eval closure. adv/write_xi distinguish the h=0
        initial eval (reads springs, never writes - the oracle discards
        its xi2) from the per-substep evals (advance by h, write)."""

        def band_force(i, nc_tot):
            off = pl.multiple_of(bands_ref[i], 8)
            woff = pl.multiple_of(off - 8, 8)
            if wrap_s:
                # ghost guard rows hold REAL copies (r > 0), so they
                # pass pair()'s touching test as i-disks whenever a
                # guard row shares an 8-row band with real rows
                # (ncs % 8 != 0 puts the top guard at an unaligned
                # plane row). Their forces/xi are discarded at exit,
                # but the contact count must not see them: mask the
                # accumulation to the real-row extent [8, 8 + ncs).
                prow = off + jax.lax.broadcasted_iota(jnp.int32, (8, C), 0)
                real_row = ((prow >= 8) & (prow < 8 + ncs)).astype(
                    jnp.float32
                )
            X = [rd(_X, k, off) for k in range(K)]
            Y = [rd(_Y, k, off) for k in range(K)]
            VX = [rd(_VX, k, off) for k in range(K)]
            VY = [rd(_VY, k, off) for k in range(K)]
            OM = [rd(_OM, k, off) for k in range(K)]
            Rr = [rd(_R, k, off) for k in range(K)]
            act = [(Rr[k] > 0).astype(jnp.float32) for k in range(K)]
            nc_acc = jnp.zeros((8, C), jnp.float32)
            for k in range(K):
                zero = jnp.zeros((8, C), jnp.float32)
                trip = jnp.where(k < kmax, kmax, 0)

                def inner(k2, acc, k=k):
                    afx, afy, atq, anc = acc
                    # partner window: this band +-8 rows of rank k2
                    # (dynamic rank keeps the unroll at 9 pair bodies
                    # per k)
                    w = [out_ref[ch, k2, pl.ds(woff, 24)]
                         for ch in (_X, _Y, _VX, _VY, _OM, _R)]
                    for dy in (-1, 0, 1):
                        for dc in (-1, 0, 1):
                            def sl(a, dy=dy, dc=dc):
                                p = jax.lax.slice(
                                    a, (8 + dy, 0), (16 + dy, C)
                                )
                                if dc:
                                    q = pltpu.roll(p, (-dc) % C, 1)
                                    if wrap_l:
                                        # lane wrap: the edge lane's
                                        # partner sits (ncl-1) lanes the
                                        # other way inside the 128-padded
                                        # plane width (cyclic shift of
                                        # period ncl != C)
                                        edge = ncl - 1 if dc > 0 else 0
                                        r_ = pltpu.roll(
                                            p, (dc * (ncl - 1)) % C, 1
                                        )
                                        q = jnp.where(col == edge, r_, q)
                                    p = q
                                return p
                            okk = oks[dc]
                            if dy == 0 and dc == 0:
                                okk = okk & (k2 != k)
                            spring = None
                            if kt_on:
                                # this (dy, dc, k2) partner slot's spring
                                # channel (dynamic leading index - k2 is
                                # the fori_loop carry)
                                xi_ch = (ch_xi0
                                         + ((dy + 1) * 3 + (dc + 1)) * K
                                         + k2)
                                spring = out_ref[xi_ch, k, pl.ds(off, 8)]
                            dfx, dfy, dtq, tt, xi_new = pair(
                                X[k], Y[k], VX[k], VY[k], OM[k], Rr[k],
                                sl(w[0]), sl(w[1]), sl(w[2]), sl(w[3]),
                                sl(w[4]), sl(w[5]), okk,
                                spring=spring, adv=adv,
                            )
                            if kt_on and write_xi:
                                out_ref[xi_ch, k, pl.ds(off, 8)] = xi_new
                            afx = afx + dfx
                            afy = afy + dfy
                            atq = atq + dtq
                            anc = anc + tt.astype(jnp.float32)
                    return (afx, afy, atq, anc)

                fx, fy, tq, nck = jax.lax.fori_loop(
                    0, trip, inner, (zero, zero, zero, zero)
                )

                # walls: mirror disk of radius 0 on the plane (skipped
                # for ranks >= kmax via a 0/1-trip loop; rows are empty)
                def wall_forces(_, acc, k=k):
                    afx, afy, atq = acc
                    for wslot, on, wpos, waxis in walls:
                        if not on:
                            continue
                        if waxis == 0:
                            xj = jnp.full_like(X[k], np.float32(wpos))
                            yj = Y[k]
                        else:
                            xj = X[k]
                            yj = jnp.full_like(Y[k], np.float32(wpos))
                        zp = jnp.zeros_like(X[k])
                        spring = None
                        if kt_on:
                            spring = out_ref[ch_xiw + wslot, k, pl.ds(off, 8)]
                        dfx, dfy, dtq, _t, xi_new = pair(
                            X[k], Y[k], VX[k], VY[k], OM[k], Rr[k],
                            xj, yj, zp, zp, zp, zp,
                            jnp.ones((8, C), dtype=bool), j_act=True,
                            min_image=False, spring=spring, adv=adv,
                        )
                        if kt_on and write_xi:
                            out_ref[ch_xiw + wslot, k, pl.ds(off, 8)] = xi_new
                        afx = afx + dfx
                        afy = afy + dfy
                        atq = atq + dtq
                    return (afx, afy, atq)

                fx, fy, tq = jax.lax.fori_loop(
                    0, jnp.where(k < kmax, 1, 0), wall_forces, (fx, fy, tq)
                )
                # hydro+body forces: from the slab tensor's baked
                # channels per-step, or from the window driver's
                # separate per-inner-step force planes (force_ref) -
                # which lets the chained window calls refresh forces
                # WITHOUT touching the big slab tensor
                if force_ref is None:
                    fhx, fhy, ftq = (rd(_FHX, k, off), rd(_FHY, k, off),
                                     rd(_THQ, k, off))
                else:
                    fhx = force_ref[0, k, pl.ds(off, 8)]
                    fhy = force_ref[1, k, pl.ds(off, 8)]
                    ftq = force_ref[2, k, pl.ds(off, 8)]
                fscr[0, k, pl.ds(off, 8)] = (fx + fhx) * act[k]
                fscr[1, k, pl.ds(off, 8)] = (fy + fhy) * act[k]
                fscr[2, k, pl.ds(off, 8)] = (tq + ftq) * act[k]
                nc_acc = nc_acc + (nck * real_row if wrap_s else nck)
            # directed-touching count of this band, accumulated into the
            # per-force-eval total carried by the fori_loop
            return nc_tot + jnp.sum(nc_acc)

        return band_force

    band_force0 = make_band_force(np.float32(0.0), False)
    band_force = make_band_force(h, True) if kt_on else band_force0

    def _mass(Rk, inv_m):
        # inv_m is the _MINV channel: already 0 for fixed/empty slots -
        # kicks vanish but the drift (x += h v) below still applies
        # (prescribed motion); per-disk densities arrive through it too
        inv_i = inv_m * 2.0 / jnp.maximum(Rk * Rk, 1e-12)
        return inv_m, inv_i, (Rk > 0).astype(jnp.float32)

    def band_kickdrift(i, c):
        # v_half from the carried force; drift x/theta; publish v_half
        # so the force eval reads (x_new, v_half) - same ordering as the
        # XLA oracle.
        off = pl.multiple_of(bands_ref[i], 8)
        for k in range(K):
            inv_m, inv_i, a = _mass(rd(_R, k, off), rd(ch_minv, k, off))
            vxh = rd(_VX, k, off) + (0.5 * h) * fscr[0, k, pl.ds(off, 8)] * inv_m
            vyh = rd(_VY, k, off) + (0.5 * h) * fscr[1, k, pl.ds(off, 8)] * inv_m
            omh = rd(_OM, k, off) + (0.5 * h) * fscr[2, k, pl.ds(off, 8)] * inv_i
            out_ref[_X, k, pl.ds(off, 8)] = rd(_X, k, off) + h * vxh * a
            out_ref[_Y, k, pl.ds(off, 8)] = rd(_Y, k, off) + h * vyh * a
            out_ref[_TH, k, pl.ds(off, 8)] = rd(_TH, k, off) + h * omh * a
            out_ref[_VX, k, pl.ds(off, 8)] = vxh
            out_ref[_VY, k, pl.ds(off, 8)] = vyh
            out_ref[_OM, k, pl.ds(off, 8)] = omh
        return c

    def band_kick2(i, c):
        off = pl.multiple_of(bands_ref[i], 8)
        for k in range(K):
            inv_m, inv_i, a = _mass(rd(_R, k, off), rd(ch_minv, k, off))
            out_ref[_VX, k, pl.ds(off, 8)] = (
                rd(_VX, k, off) + (0.5 * h) * fscr[0, k, pl.ds(off, 8)] * inv_m
            ) * a
            out_ref[_VY, k, pl.ds(off, 8)] = (
                rd(_VY, k, off) + (0.5 * h) * fscr[1, k, pl.ds(off, 8)] * inv_m
            ) * a
            out_ref[_OM, k, pl.ds(off, 8)] = (
                rd(_OM, k, off) + (0.5 * h) * fscr[2, k, pl.ds(off, 8)] * inv_i
            ) * a
        return c

    # n_contacts matches the XLA oracle: the max over force evaluations
    # (initial state included, like the oracle's nc0 seed) of the GLOBAL
    # directed-touching sum. A global scalar per eval is the only
    # correct granularity — a per-cell max would overcount pairs that
    # migrate between broadphase cells mid-subcycle.
    nc_ref[0] = jax.lax.fori_loop(0, nocc, band_force0, jnp.float32(0.0))

    def substep(_, c):
        jax.lax.fori_loop(0, nocc, band_kickdrift, 0)
        if wrap_s:
            # ghost rows must reflect the drifted x and published v_half
            # before the next force eval
            refresh_wrap_rows()
        tot = jax.lax.fori_loop(0, nocc, band_force, jnp.float32(0.0))
        nc_ref[0] = jnp.maximum(nc_ref[0], tot)
        jax.lax.fori_loop(0, nocc, band_kick2, 0)
        return c

    jax.lax.fori_loop(0, cfg.n_sub, substep, 0)


def _kernel_call(slabs, kmax, n_occ, band_offs, grid: DemGrid,
                 cfg: SimConfig, axis: str, forces3=None,
                 slim: bool = False):
    """One subcycle pass of the slab kernel (shared by the per-step
    entry point and the coupling-cadence window driver). The slabs
    buffer is donated and returned updated: state (and kt spring)
    channels advance, the input-only channels pass through untouched.

    forces3 (window driver, inner steps > 0): a fresh (3, K, R, C)
    hydro+body force stack the kernel reads INSTEAD of the slab
    tensor's baked _FHX/_FHY/_THQ channels - refreshing per-inner-step
    forces costs one small scatter + plane input rather than a
    read-modify-write of the whole slab tensor (the in-place rescatter
    variant measured 5-7x SLOWER end-to-end)."""
    ncs, ncl, R, C, nb = slab_dims(grid, axis)
    wrap_s, wrap_l = _wrap_sl(grid, axis)
    kernel = functools.partial(_dem_kernel, cfg=cfg, ncs=ncs, ncl=ncl, R=R,
                               C=C, wrap_s=wrap_s, wrap_l=wrap_l, slim=slim)
    operands = [kmax.reshape(1), n_occ.reshape(1), band_offs, slabs]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    if forces3 is not None:
        assert forces3.shape == (3,) + slabs.shape[1:]
        operands.append(forces3)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        inner = kernel
        kernel = (lambda kr, nr, br, sr, fr, outr, ncr, fscr_:
                  inner(kr, nr, br, sr, outr, ncr, fscr_, force_ref=fr))
    else:
        assert not slim  # slim slabs carry no baked force channels
    return pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(slabs.shape, jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((3, SLAB_K, R, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
        input_output_aliases={3: 0},
        interpret=_interpret(),
    )(*operands)


def dem_subcycle(
    disks: DiskState, f_hydro, t_hydro, grid: DemGrid, cfg: SimConfig,
    axis: str = "y",
) -> Tuple[DiskState, jax.Array, jax.Array]:
    """Drop-in Pallas replacement for ops.dem.dem_subcycle (kt >= 0;
    the kt > 0 history springs ride extra slab channels rematched
    through DiskState.ct_j/ct_xi - see the module docstring)."""
    kt_on = cfg.kt > 0.0
    body_f = dem_ops.body_forces(disks, cfg)
    slabs, slot, overflow, kmax, n_occ, band_offs, j36 = build_slabs(
        disks, f_hydro, t_hydro, body_f, grid, axis, kt=kt_on
    )
    out, nc_s = _kernel_call(slabs, kmax, n_occ, band_offs, grid, cfg,
                             axis)
    new, overflow = _unslab(out, slot, disks, cfg, j36, overflow)
    # Active disks the slab could NOT slot (rank >= SLAB_K overflow)
    # must not freeze in place while the XLA oracle keeps integrating
    # them: give them a contact-free Verlet fallback (hydro + body +
    # walls). The traced zero-trip bound skips all the work in the
    # common overflow == 0 case (Mosaic/XLA skip zero-trip loops).
    leftover = disks.active & (slot < 0)
    new = _leftover_fallback(new, disks, leftover, overflow, f_hydro,
                             t_hydro, body_f, cfg)
    # contact count: max over force evals of the global directed sum / 2
    nc = (nc_s[0] * 0.5).astype(jnp.int32)
    return new, overflow, nc


def _unslab(out, slot, disks: DiskState, cfg: SimConfig, j36, overflow,
            slim: bool = False):
    """(new DiskState, overflow): one row-gather back to disk order -
    the 6 integrated state channels (_X.._TH), plus the spring channels
    when kt > 0. The input-only channels (_R/_MINV, and _FHX/_FHY/_THQ
    unless slim) are never consumed after exit - dropping them from the
    transpose+gather cuts ~10% of the slab-exit traffic on spring
    scenes. slim: the window driver's 8-channel layout (springs at 8)."""
    kt_on = cfg.kt > 0.0
    if kt_on:
        keep_ch = jnp.concatenate([out[:6], out[8 if slim else _XI0:]],
                                  axis=0)
    else:
        keep_ch = out[:6]
    width = keep_ch.shape[0]
    flat_t = keep_ch.reshape(width, -1).T  # (nslots, width)
    ok = slot >= 0
    g = flat_t[jnp.maximum(slot, 0)]  # (N, width)
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
    if kt_on:
        # Compact the nonzero springs to the (N, contact_cap) carry
        # (partner id + stretch), the same format the XLA subcycle
        # stores - the two paths interoperate mid-run. Springs beyond
        # contact_cap are dropped and counted as overflow (coordination
        # of equal-size disks is <= 6, so cap 10 never truncates in
        # practice).
        cap = cfg.contact_cap
        xi36 = g[:, 6:6 + _NXI]  # keep_ch frame: springs start at col 6
        live = ok & disks.active
        keep = (j36 >= 0) & (xi36 != 0.0) & live[:, None]
        k_eff = min(cap, _NXI)
        vals, ordr = jax.lax.top_k(keep.astype(jnp.float32), k_eff)
        ct_j = jnp.take_along_axis(jnp.where(keep, j36, -1), ordr, axis=1)
        ct_j = jnp.where(vals > 0, ct_j, -1)
        ct_xi = jnp.where(
            vals > 0,
            jnp.take_along_axis(jnp.where(keep, xi36, 0.0), ordr, axis=1),
            0.0,
        ).astype(dt)
        if cap > k_eff:
            pad = cap - k_eff
            ct_j = jnp.concatenate(
                [ct_j, jnp.full((ct_j.shape[0], pad), -1, jnp.int32)], 1
            )
            ct_xi = jnp.concatenate(
                [ct_xi, jnp.zeros((ct_xi.shape[0], pad), dt)], 1
            )
        ovf_ct = (jnp.sum(keep, dtype=jnp.int32)
                  - jnp.sum(ct_j >= 0, dtype=jnp.int32))
        overflow = jnp.maximum(overflow, ovf_ct)
        wall_xi = jnp.where(
            live[:, None],
            g[:, 6 + _NXI:6 + _NXI + 4].astype(dt), disks.wall_xi,
        )
        new = new._replace(ct_j=ct_j, ct_xi=ct_xi, wall_xi=wall_xi)
    return new, overflow


def dem_subcycle_window(
    disks: DiskState, forces, grid: DemGrid, cfg: SimConfig,
    axis: str = "y",
) -> Tuple[DiskState, jax.Array, jax.Array]:
    """len(forces) sequential DEM subcycles - one per LBM inner step of
    a coupling-cadence window (cfg.coupling_k) - with ONE slab build
    and ONE unslab for the whole window. forces = [(f_hydro, t_hydro),
    ...] per inner step.

    Between chained kernel calls only a small (3, K, R, C) force-plane
    input is rebuilt (scatter into zeros; the kernel reads it instead
    of the slab tensor's baked force channels, and its output slab
    tensor already holds post-step x/v/omega/theta and advanced kt
    springs in slab layout), so the per-step sort/rank/scatter build
    and the transpose+gather exit both amortize k-fold. Slot assignments (and the kt partner map) stay frozen at
    window-start positions: adjacency is valid while window travel
    stays under the grid skin/2 (the candidate-validity bound
    DemGrid.build documents per step) - violations are counted into
    the overflow like every other capacity in this framework, never
    silently dropped.

    The staleness counter is a POST-HOC detector (ADVICE r4): it trips
    AFTER the window already integrated with the frozen contact set,
    so a contact first formed mid-window by a faster-than-skin/2 disk
    was missed for the remainder of that window, not recomputed.
    state.overflow > 0 on a coupling_k run therefore means the
    trajectory is suspect from the first flagged window on - re-run
    with a smaller coupling_k (coupling_k=1 restores the per-step
    rebuild and its per-step skin bound) rather than trusting the
    tail; cfg.paranoia="chunk" narrows down the failing window."""
    kt_on = cfg.kt > 0.0
    body_f = dem_ops.body_forces(disks, cfg)
    # slim slabs: no baked force channels - EVERY inner step (incl.
    # t=0) reads a scatter-built (3, K, R, C) force-plane input. One
    # kernel flavor for the whole window (less Mosaic compile), and the
    # slab tensor (+ its staged output copy) shrinks 3/11 - the margin
    # that keeps the 8192^2 coupling_k window under the scoped-VMEM
    # limit (r4: 110.93M > 100.66M with baked channels).
    slabs, slot, overflow, kmax, n_occ, band_offs, j36 = build_slabs(
        disks, forces[0][0], forces[0][1], body_f, grid, axis, kt=kt_on,
        bake_forces=False,
    )
    nc_s = None
    # ONE channel-packed scatter builds ALL k force planes (every inner
    # step's forces exist up front - the LBM window kernel emitted them
    # stacked): XLA scatter calls serialize on TPU (~0.5 ms each at 10k
    # rows), so k separate _force_planes calls were over half the DEM
    # window marginal at k=8 (tools/ablate.py, r5). Static slices of
    # the leading axis feed the chained kernel calls copy-free.
    f3all = _force_planes_window(slot, forces, body_f, slabs.shape)
    for t in range(len(forces)):
        slabs, nc_s = _kernel_call(slabs, kmax, n_occ, band_offs, grid,
                                   cfg, axis, forces3=f3all[t], slim=True)
    new, overflow = _unslab(slabs, slot, disks, cfg, j36, overflow,
                            slim=True)
    # leftover (un-slotted) disks integrate per inner step in disk
    # order, chained across the window (zero-trip when overflow == 0)
    leftover = disks.active & (slot < 0)
    d_fb = disks
    for fh, th_ in forces:
        d_fb = _leftover_fallback(d_fb, d_fb, leftover, overflow, fh,
                                  th_, body_f, cfg)
    lo2 = leftover[:, None]
    new = new._replace(
        x=jnp.where(lo2, d_fb.x, new.x),
        v=jnp.where(lo2, d_fb.v, new.v),
        omega=jnp.where(leftover, d_fb.omega, new.omega),
        theta=jnp.where(leftover, d_fb.theta, new.theta),
    )
    # slot-staleness detector: displacement beyond the skin/2 candidate
    # margin over the window means the frozen adjacency may have missed
    # a fresh contact
    trav2 = jnp.where(
        disks.active, jnp.sum((new.x - disks.x) ** 2, axis=-1), 0.0
    )
    stale = jnp.sum(
        trav2 > (0.5 * float(grid.skin)) ** 2, dtype=jnp.int32
    )
    overflow = jnp.maximum(overflow, stale)
    nc = (nc_s[0] * 0.5).astype(jnp.int32)
    return new, overflow, nc


def _force_planes_window(slot_of_disk, forces, body_f, slab_shape):
    """(k, 3, K, R, C) hydro+body force stacks for ALL k window inner
    steps in ONE channel-packed column scatter into zeros (XLA scatter
    serializes per call on TPU - k calls measured over half the DEM
    window marginal at k=8; build_slabs' measured-fast pattern, never a
    read-modify-write of the big slab tensor: that variant forced
    whole-tensor relayout/copy chains and benched 5-7x slower
    end-to-end). forces = [(f_hydro, t_hydro), ...] per inner step."""
    n = slot_of_disk.shape[0]
    f32 = jnp.float32
    body_f = jnp.broadcast_to(body_f, (n, 2))
    rows = []
    for f_hydro, t_hydro in forces:
        f_hydro = jnp.broadcast_to(f_hydro, (n, 2))
        t_hydro = jnp.broadcast_to(t_hydro, (n,))
        rows.extend([
            (f_hydro[:, 0] + body_f[:, 0]).astype(f32),
            (f_hydro[:, 1] + body_f[:, 1]).astype(f32),
            t_hydro.astype(f32),
        ])
    packed = jnp.stack(rows, axis=0)  # (3k, n)
    k = len(forces)
    K, R, C = slab_shape[1:]
    nslots = K * R * C
    # mask + clip explicitly: .at[] wraps negative indices even with
    # mode='drop' (CLAUDE.md)
    tgt = jnp.where(slot_of_disk >= 0, slot_of_disk, nslots)
    dense = (jnp.zeros((3 * k, nslots), f32)
             .at[:, tgt].set(packed, mode="drop"))
    return dense.reshape(k, 3, K, R, C)


def _leftover_fallback(new, disks, leftover, overflow, f_hydro, t_hydro,
                       body_f, cfg):
    """Velocity-Verlet (no disk-disk contacts) for un-slotted disks."""
    dt = disks.x.dtype
    h = jnp.asarray(1.0 / cfg.n_sub, dt)
    inv_m = jnp.where(leftover & disks.mobile, 1.0 / disks.mass, 0.0)
    inv_i = jnp.where(leftover & disks.mobile, 1.0 / disks.inertia, 0.0)
    lo2 = leftover[:, None]

    def force(d):
        Fw, Tw, _ = dem_ops.wall_forces(d, cfg)
        return ((Fw + f_hydro + body_f) * lo2,
                (Tw + t_hydro) * leftover)

    def body(_, carry):
        d, F, T = carry
        vh = d.v + (0.5 * h) * F * inv_m[:, None]
        omh = d.omega + (0.5 * h) * T * inv_i
        d = d._replace(
            x=d.x + h * vh * lo2, theta=d.theta + h * omh * leftover
        )
        F2, T2 = force(d._replace(v=vh, omega=omh))
        d = d._replace(
            v=jnp.where(lo2, vh + (0.5 * h) * F2 * inv_m[:, None], d.v),
            omega=jnp.where(leftover, omh + (0.5 * h) * T2 * inv_i, d.omega),
        )
        return (d, F2, T2)

    trip = jnp.where(overflow > 0, cfg.n_sub, 0)
    F0, T0 = force(disks)
    d_fb, _, _ = jax.lax.fori_loop(0, trip, body, (disks, F0, T0))
    return new._replace(
        x=jnp.where(lo2, d_fb.x, new.x),
        v=jnp.where(lo2, d_fb.v, new.v),
        omega=jnp.where(leftover, d_fb.omega, new.omega),
        theta=jnp.where(leftover, d_fb.theta, new.theta),
    )
