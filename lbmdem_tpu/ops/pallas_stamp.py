"""Pallas solid-fraction stamping: tile-binned disks -> dense coverage.

Replaces the XLA scatter-add in imb.stamp_solid_fraction (C9), which
serializes on TPU (~400 ms at 10k disks / 4096^2). TPU-first structure:

1. XLA side (`bin_disks_to_tiles`): each disk's stamp window intersects
   at most 2x2 lattice tiles (window <= tile). Emit up to 4 (tile, disk)
   entries, bucket them into fixed-capacity per-tile lists with the same
   argsort-rank trick as the DEM cell table, and gather the disk data
   into a per-tile SoA (n_tiles, CAP, 8). Overflow is counted, never
   silently dropped.
2. Pallas kernel: grid over tiles; the tile's disk data block sits in
   SMEM (scalar memory - the supported home for loop-indexed scalars);
   a `fori_loop` over the tile's count accumulates each disk's coverage
   and coverage-weighted rigid-body velocity densely over the whole
   tile on the VPU. No scatters, no atomics; deterministic.

Coverage model matches the oracle: eps_samples^2 subgrid sampling
(cfg.eps_method == "sample"), or a linear ramp clip(r + 1/2 - d, 0, 1)
(cfg.eps_method == "ramp") - both available in ops/imb.py for parity.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lbmdem_tpu.config import SimConfig
from lbmdem_tpu.ops.imb import exact_coverage

def _interpret() -> bool:
    """Compiled on TPU; interpreter elsewhere (CPU tests, debugging)."""
    return _INTERPRET or jax.default_backend() != "tpu"


_INTERPRET = False  # force-interpret override

# disks evaluated per kernel loop iteration (issue-latency bound loops;
# see _reduce_kernel). Effective factor is the largest divisor of cap.
_ILP = 8


def tile_dims(cfg: SimConfig) -> Tuple[int, int]:
    """Stamp tiles: rows follow the COUPLED lattice tile height (256
    since the r4 per-path tile flavors - the fused coupled kernel
    requires stamp rows == lattice tile rows, and row-banding makes the
    per-disk stamp cost tile-height-independent); 128 columns (the
    stamp's sub-tile granule). The tile must still be >= the stamp
    window for the <=2x2 intersect invariant of the binning.
    parallel/_pallas_step.canvas_pads mirrors the row chain."""
    import os

    from lbmdem_tpu.ops.pallas_lbm import coupled_tile_rows

    # the kernel chain IS the source (plus sub-8 rows for tiny test
    # grids, which the fused kernel never sees)
    rows = coupled_tile_rows(cfg.coupling_k) + (4, 2, 1)
    th = next(t for t in rows if cfg.ny % t == 0)
    tw = next(t for t in (128, 64, 32, 16, 8, 4, 2, 1) if cfg.nx % t == 0)
    # the fused coupled kernel requires stamp tile rows == LATTICE tile
    # rows (its (nty*ntx, sub) reshape of the binning assumes one stamp
    # row-band per lattice tile), so the lattice-tile A/B override
    # applies here too (tools/ab_tiles.py; banding keeps the per-disk
    # stamp cost th-independent)
    th_env = os.environ.get("LBMDEM_TH")
    if th_env and cfg.ny % int(th_env) == 0:
        th = int(th_env)
    assert cfg.window <= min(th, tw), (
        f"stamp window {cfg.window} exceeds tile {th}x{tw}; disks too "
        f"large for the Pallas stamp path on this lattice"
    )
    return th, tw


def band_height(window: int, th: int) -> int:
    """Static 8-aligned per-disk row-band height covering a stamp window.

    The per-disk kernel loops evaluate coverage only on a bh-row band
    around the disk's center row (dynamic 8-aligned VMEM row slices -
    the same idiom as the occupancy-banded DEM kernel). The band start
    off = clip(floor8(by - tile_y0), 0, th - bh) covers the window's
    in-tile rows iff bh >= window + 7 (floor8 loses up to 7 rows;
    clipping at either edge only ever widens coverage toward the
    window). Returns th when banding cannot help (big disks)."""
    bh = (window + 7 + 7) & ~7
    return th if bh >= th else bh


def default_tile_cap(tile_h: int, tile_w: int, r_min: float, window: int) -> int:
    """Static per-tile disk capacity: dense packing of the smallest disks
    over the tile plus its window margin, with 2x headroom."""
    area = (tile_h + window) * (tile_w + window)
    per_disk = max((2.0 * r_min) ** 2 * 0.85, 1.0)  # ~hex packing
    cap = int(1.5 * area / per_disk) + 16
    return min((cap + 7) & ~7, 4096)  # round up to sublane multiple


def build_tile_lists(
    xp: jax.Array,
    active: jax.Array,
    cfg: SimConfig,
    margin: int = 0,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Bucket disks into per-tile lists by stamp-window intersection.

    Returns (lists (n_tiles, cap) i32, counts (n_tiles,1,1) i32,
    entry_slots (N, 4) i32 - the flat tile*cap+rank slot of each of the
    disk's <=4 tile entries, -1 if unused - and overflow () i32).

    `margin` widens the intersection test by that many cells per side so
    the lists stay valid while disks travel < margin (Verlet-cadence
    rebuilds; the caller checks travel and counts violations)."""
    th, tw = tile_dims(cfg)
    nty, ntx = cfg.ny // th, cfg.nx // tw
    n_tiles = nty * ntx
    cap = cfg.tile_cap
    assert cap > 0, "cfg.tile_cap must be set (Simulation derives it)"
    n = xp.shape[0]
    window = cfg.window + 2 * margin
    assert window <= min(th, tw), (
        f"stamp window {cfg.window} + margins exceeds tile {th}x{tw}"
    )
    half = window // 2

    bx = jnp.floor(xp[:, 0] + 0.5).astype(jnp.int32) - half
    by = jnp.floor(xp[:, 1] + 0.5).astype(jnp.int32) - half
    ty0 = jnp.floor_divide(by, th)
    ty1 = jnp.floor_divide(by + window - 1, th)
    tx0 = jnp.floor_divide(bx, tw)
    tx1 = jnp.floor_divide(bx + window - 1, tw)

    tys = jnp.stack([ty0, ty0, ty1, ty1], 1)  # (N, 4)
    txs = jnp.stack([tx0, tx1, tx0, tx1], 1)
    dup = jnp.stack(
        [
            jnp.zeros((n,), bool),
            tx1 == tx0,
            ty1 == ty0,
            (tx1 == tx0) | (ty1 == ty0),
        ],
        1,
    )
    ok = (
        (tys >= 0) & (tys < nty) & (txs >= 0) & (txs < ntx)
        & ~dup & active[:, None]
    )
    tid = jnp.where(ok, tys * ntx + txs, -1).reshape(-1)  # (4N,)
    disk_of = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, 4)
    ).reshape(-1)

    # one 3-operand sort; ranks via segment-start cummax (searchsorted
    # of 40k-vs-40k costs ~5 ms on TPU, cummax is ~free)
    iota4 = jnp.arange(4 * n, dtype=jnp.int32)
    stid, sdisk, sentry = jax.lax.sort((tid, disk_of, iota4), num_keys=1)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), stid[1:] != stid[:-1]]
    )
    first = jax.lax.cummax(jnp.where(is_start, iota4, 0))
    rank = iota4 - first
    valid = (stid >= 0) & (rank < cap)
    slot = jnp.where(valid, stid * cap + rank, n_tiles * cap)
    lists = (
        jnp.full((n_tiles * cap,), -1, jnp.int32)
        .at[slot]
        .set(sdisk, mode="drop")
        .reshape(n_tiles, cap)
    )
    overflow = jnp.sum((stid >= 0) & (rank >= cap)).astype(jnp.int32)
    counts = jnp.sum(lists >= 0, axis=1, dtype=jnp.int32).reshape(n_tiles, 1, 1)
    # inverse map: entry e -> its slot (for gather-based force reduction)
    entry_slots = (
        jnp.full((4 * n,), -1, jnp.int32)
        .at[sentry]
        .set(jnp.where(valid, slot, -1).astype(jnp.int32))
        .reshape(n, 4)
    )

    return lists, counts, entry_slots, overflow


def gather_tile_data(
    lists: jax.Array, xp, vp, omega, r, active
) -> jax.Array:
    """Per-tile disk SoA (n_tiles, 1, cap*8) f32 gathered at the CURRENT
    positions (refreshed every step; the lists may be older)."""
    n = xp.shape[0]
    n_tiles, cap = lists.shape
    f32 = jnp.float32
    j = jnp.maximum(lists, 0)
    packed = jnp.stack(
        [
            xp[:, 0].astype(f32),
            xp[:, 1].astype(f32),
            vp[:, 0].astype(f32),
            vp[:, 1].astype(f32),
            omega.astype(f32),
            r.astype(f32),
            active.astype(f32),
            jnp.zeros((n,), f32),
        ],
        axis=1,
    )
    return jnp.where(
        (lists >= 0)[..., None], packed[j], 0.0
    ).reshape(n_tiles, 1, cap * 8)


def bin_disks_to_tiles(
    xp: jax.Array,
    vp: jax.Array,
    omega: jax.Array,
    r: jax.Array,
    active: jax.Array,
    cfg: SimConfig,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Fresh lists + data in one call: (tile_data, counts, entry_slots,
    overflow). Per-step callers on a Verlet cadence use build_tile_lists
    + gather_tile_data instead."""
    lists, counts, entry_slots, overflow = build_tile_lists(xp, active, cfg)
    tile_data = gather_tile_data(lists, xp, vp, omega, r, active)
    return tile_data, counts, entry_slots, overflow


def _cov_field(relx, rely, rr, cfg: SimConfig):
    """Per-cell coverage of one disk over the given rel-coordinate grids
    (the per-disk body shared by the stamp and reduce kernel loops).
    Empty (over-iterated, zeroed) slots rr == 0 yield zero coverage for
    every method. cfg.eps_r_shift applies the hydrodynamic-radius
    calibration here, identically to the oracle (imb._coverage_window),
    so kernel/oracle sample membership stays bitwise under it."""
    ns = cfg.eps_samples
    if cfg.eps_r_shift:
        rr = jnp.where(
            rr > 0,
            jnp.maximum(rr + jnp.float32(cfg.eps_r_shift), 0.05), 0.0)
    if cfg.eps_method == "ramp":
        d = jnp.sqrt(rely * rely + relx * relx)
        # rr==0 marks an empty slot: mask it, the ramp would otherwise
        # stamp phantom cover where d < 1/2
        return jnp.where(rr > 0, jnp.clip(rr + 0.5 - d, 0.0, 1.0), 0.0)
    if cfg.eps_method == "exact":
        # analytic tangent-plane overlap (see imb.exact_coverage)
        return exact_coverage(relx, rely, rr)
    # "sample": factor the squares (ns + ns maps instead of ns^2) and
    # hoist the row term out of the comparison (t = r^2 - dy^2 once per
    # row offset) so each of the ns^2 passes is one cmp + masked-add.
    # The t-form must match the oracle's (imb._coverage_window) BITWISE
    # - a flipped boundary sample is a 1/ns^2 coverage step.
    inv_s2 = np.float32(1.0 / (ns * ns))
    offs = ((np.arange(ns) + 0.5) / ns - 0.5).astype(np.float32)
    r2 = rr * rr
    ts = [r2 - (rely + sy) * (rely + sy) for sy in offs]
    dx2s = [(relx + sx) * (relx + sx) for sx in offs]
    cov = jnp.zeros(relx.shape, jnp.float32)
    for t in ts:
        for dx2 in dx2s:
            cov = cov + jnp.where(dx2 <= t, inv_s2, 0.0)
    if ns % 2:  # odd ns has a 0-offset sample: empty slots hit d=0
        cov = jnp.where(rr > 0, cov, 0.0)
    return cov


def _stamp_kernel(data_ref, cnt_ref, out_ref, *, cfg: SimConfig, th: int,
                  tw: int, eps_min: float):
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    y0i = ty * th
    x0 = (tx * tw).astype(jnp.float32)
    bh = band_height(cfg.window, th)
    half = cfg.window // 2
    # iota must be integer on TPU; cast after
    yb = jax.lax.broadcasted_iota(jnp.int32, (bh, tw), 0).astype(jnp.float32)
    xx = x0 + jax.lax.broadcasted_iota(jnp.int32, (bh, tw), 1).astype(jnp.float32)

    def one(k):
        """Per-disk band offset + (cov, cov*us_x, cov*us_y) on the
        bh-row band; zeroed slots give cov==0."""
        base = k * 8
        px = data_ref[0, 0, base + 0]
        py = data_ref[0, 0, base + 1]
        vx = data_ref[0, 0, base + 2]
        vy = data_ref[0, 0, base + 3]
        om = data_ref[0, 0, base + 4]
        rr = data_ref[0, 0, base + 5]
        by = jnp.floor(py + 0.5).astype(jnp.int32) - half - y0i
        off = jnp.clip(jnp.floor_divide(by, 8) * 8, 0, th - bh)
        off = pl.multiple_of(off, 8)
        rely = (y0i + off).astype(jnp.float32) + yb - py
        relx = xx - px
        cov = _cov_field(relx, rely, rr, cfg)
        usx = vx - om * rely
        usy = vy + om * relx
        return off, cov, cov * usx, cov * usy

    # interleave ilp independent disks per iteration (issue-latency
    # bound loop; see _reduce_kernel); the band RMWs may alias between
    # slots, so they run in slot order after the independent compute.
    cap = cfg.tile_cap
    ilp = max(d for d in (_ILP, 2, 1) if cap % d == 0)
    out_ref[...] = jnp.zeros((3, th, tw), jnp.float32)

    def body(g, carry):
        k0 = g * ilp
        outs = [one(k0 + j) for j in range(ilp)]
        for off, cov, cmx, cmy in outs:
            out_ref[0, pl.ds(off, bh)] = out_ref[0, pl.ds(off, bh)] + cov
            out_ref[1, pl.ds(off, bh)] = out_ref[1, pl.ds(off, bh)] + cmx
            out_ref[2, pl.ds(off, bh)] = out_ref[2, pl.ds(off, bh)] + cmy
        return carry

    jax.lax.fori_loop(
        0, (cnt_ref[0, 0, 0] + (ilp - 1)) // ilp, body, jnp.int32(0)
    )
    inv = 1.0 / jnp.maximum(out_ref[0], eps_min)
    out_ref[1] = out_ref[1] * inv
    out_ref[2] = out_ref[2] * inv


def stamp_solid_fraction(
    xp, vp, omega, r, active, cfg: SimConfig, binned=None, as_stack=False
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Pallas stamp. Returns (eps_raw, us_x, us_y, bin_overflow), or
    with as_stack=True ((3, ny, nx) stacked fields, bin_overflow) - the
    kernel writes the three planes as one array, so stacked consumers
    (pallas_lbm.fused_step_imb_reduce) skip a 3-plane re-stack copy.
    Pass `binned` = bin_disks_to_tiles(...) to reuse one binning for
    both stamp and reduce within a step."""
    from lbmdem_tpu.ops.imb import _EPS_MIN

    th, tw = tile_dims(cfg)
    nty, ntx = cfg.ny // th, cfg.nx // tw
    cap = cfg.tile_cap
    tile_data, counts, _, overflow = (
        binned if binned is not None
        else bin_disks_to_tiles(xp, vp, omega, r, active, cfg)
    )
    kernel = functools.partial(_stamp_kernel, cfg=cfg, th=th, tw=tw,
                               eps_min=_EPS_MIN)
    fields = pl.pallas_call(
        kernel,
        grid=(nty, ntx),
        in_specs=[
            pl.BlockSpec(
                (1, 1, cap * 8),
                lambda i, j: (i * ntx + j, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1), lambda i, j: (i * ntx + j, 0, 0),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (3, th, tw), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, cfg.ny, cfg.nx), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=_interpret(),
    )(tile_data, counts)
    if as_stack:
        return fields, overflow
    return fields[0], fields[1], fields[2], overflow


def reduce_partials_banded(get, cnt, y0i, x0f, w_ref, col0: int, th: int,
                           bh: int, cap: int, cfg: SimConfig,
                           max_ilp: int = 0, ncols: int = 128):
    """(cap, 4) per-slot [fx, fy, tq, 0] partials over one stamp tile,
    evaluated on a bh-row 8-aligned band per disk.

    The per-disk loops are issue-bound, so cost scales with the rows
    each disk evaluates; a bh-row band around the disk's center row
    (bh = band_height(window, th), dynamic 8-aligned VMEM row slices -
    the occupancy-banded DEM idiom) replaces the full th-row sub-tile.

    `get(i)` reads scalar i of the sub-tile's SMEM disk-data row
    (layout per gather_tile_data); `cnt` is its disk count; `w_ref` is
    a (2, th, >= col0+ncols) VMEM scratch already holding the
    share-denominated momentum exchange (wx, wy) for this tile; `col0`
    the sub-tile's static column offset into it; `y0i` the tile's
    global integer row origin; `x0f` the sub-tile's global f32 column
    origin. `max_ilp` interleaves that many independent per-disk chains
    per loop iteration (the single-disk body is a serial chain of
    small-vector ops whose ISSUE LATENCY, not VPU throughput, bounds
    the loop); ilp divides cap, so over-iteration stays in bounds.
    Shared by the standalone _reduce_kernel and the fused IMB+reduce
    kernel (pallas_lbm._imb_reduce_kernel).
    """
    half = cfg.window // 2
    slot_rows = jax.lax.broadcasted_iota(jnp.int32, (cap, 4), 0)
    yb = jax.lax.broadcasted_iota(jnp.int32, (bh, ncols), 0).astype(jnp.float32)
    xx = x0f + jax.lax.broadcasted_iota(jnp.int32, (bh, ncols), 1).astype(
        jnp.float32
    )

    def one(k):
        base = k * 8
        px = get(base + 0)
        py = get(base + 1)
        rr = get(base + 5)
        by = jnp.floor(py + 0.5).astype(jnp.int32) - half - y0i
        off = jnp.clip(jnp.floor_divide(by, 8) * 8, 0, th - bh)
        off = pl.multiple_of(off, 8)
        rely = (y0i + off).astype(jnp.float32) + yb - py
        relx = xx - px
        cov = _cov_field(relx, rely, rr, cfg)
        fx_c = cov * w_ref[0, pl.ds(off, bh), pl.ds(col0, ncols)]
        fy_c = cov * w_ref[1, pl.ds(off, bh), pl.ds(col0, ncols)]
        fx = jnp.sum(fx_c)
        fy = jnp.sum(fy_c)
        tq = jnp.sum(relx * fy_c - rely * fx_c)
        return fx, fy, tq

    ilp = max(d for d in (max_ilp or _ILP, 2, 1) if cap % d == 0)

    def body(g, acc):
        k0 = g * ilp
        vals = jnp.zeros((cap, 4), jnp.float32)
        for j in range(ilp):
            fx, fy, tq = one(k0 + j)
            row = jnp.stack([fx, fy, tq, jnp.float32(0.0)])[None, :]
            vals = vals + jnp.where(slot_rows == k0 + j, row, 0.0)
        return acc + vals

    groups = (cnt + (ilp - 1)) // ilp
    return jax.lax.fori_loop(
        0, groups, body, jnp.zeros((cap, 4), jnp.float32)
    )


def remap_entry_slots(entry_slots, cap: int, ntx_src: int, oy_t: int,
                      ox_t: int, nty_dst: int, ntx_dst: int) -> jax.Array:
    """Renumber binning entry slots from a source tile grid into a
    (nty_dst, ntx_dst) sub-grid at tile offset (oy_t, ox_t).

    The sharded fused-reduce path bins disks once on the padded stamp
    CANVAS (tiles aligned to the interior's stamp sub-tiles) and feeds
    only the interior tile rows to pallas_lbm.fused_step_imb_reduce;
    its per-slot partials are numbered over the interior grid, so the
    inverse map must be renumbered the same way. Entries landing in the
    canvas apron become -1 (their cells belong to a neighbor shard,
    which reduces and psums them)."""
    t = entry_slots // cap
    rank = entry_slots - t * cap
    iy = t // ntx_src - oy_t
    ix = t % ntx_src - ox_t
    ok = (
        (entry_slots >= 0)
        & (iy >= 0) & (iy < nty_dst) & (ix >= 0) & (ix < ntx_dst)
    )
    return jnp.where(ok, (iy * ntx_dst + ix) * cap + rank, -1)


def gather_partials(flat, entry_slots, dtype) -> Tuple[jax.Array, jax.Array]:
    """Sum each disk's <=4 per-tile partials via the binning's inverse
    map (one small row-gather, no scatter): (F (N,2), T (N,))."""
    pos = entry_slots  # (N, 4), -1 unused
    got = jnp.where(
        (pos >= 0)[..., None], flat[jnp.maximum(pos, 0)], 0.0
    )  # (N, 4, 4)
    tot = jnp.sum(got, axis=1)
    return tot[:, :2].astype(dtype), tot[:, 2].astype(dtype)


def _reduce_kernel(
    data_ref, cnt_ref, eps_ref, phi_ref, out_ref, wscr, *, cfg: SimConfig,
    th: int, tw: int, cap: int, eps_min: float
):
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    share_den = 1.0 / jnp.maximum(eps_ref[0], eps_min)
    wscr[0] = phi_ref[0] * share_den
    wscr[1] = phi_ref[1] * share_den
    out_ref[0] = reduce_partials_banded(
        lambda i: data_ref[0, 0, i], cnt_ref[0, 0, 0], ty * th,
        (tx * tw).astype(jnp.float32), wscr, 0, th,
        band_height(cfg.window, th), cap, cfg, ncols=tw,
    )


def reduce_hydro_forces(
    xp, r, active, eps_raw, phi_x, phi_y, cfg: SimConfig,
    tile_data, counts, entry_slots,
) -> Tuple[jax.Array, jax.Array]:
    """Pallas hydrodynamic force/torque reduction (C12).

    Per tile, each binned disk reduces its share-weighted momentum
    exchange over the tile's cells into a per-slot partial; the <=4
    partials per disk are then gathered back via `entry_slots` (the
    binning's inverse map) and summed - no scatter anywhere.
    """
    from lbmdem_tpu.ops.imb import _EPS_MIN

    th, tw = tile_dims(cfg)
    nty, ntx = cfg.ny // th, cfg.nx // tw
    cap = cfg.tile_cap
    n = xp.shape[0]
    phi = jnp.stack([phi_x, phi_y])
    kernel = functools.partial(
        _reduce_kernel, cfg=cfg, th=th, tw=tw, cap=cap, eps_min=_EPS_MIN
    )
    partials = pl.pallas_call(
        kernel,
        grid=(nty, ntx),
        in_specs=[
            pl.BlockSpec(
                (1, 1, cap * 8), lambda i, j: (i * ntx + j, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1), lambda i, j: (i * ntx + j, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((1, th, tw), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, th, tw), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, cap, 4), lambda i, j: (i * ntx + j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nty * ntx, cap, 4), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, th, tw), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=_interpret(),
    )(tile_data, counts, eps_raw[None], phi)
    return gather_partials(
        partials.reshape(nty * ntx * cap, 4), entry_slots, xp.dtype
    )
