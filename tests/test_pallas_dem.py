"""Slab-kernel DEM subcycle vs the XLA oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbmdem_tpu.config import DiskSpec, SimConfig
from lbmdem_tpu.ops import dem, pallas_dem
from lbmdem_tpu.ops.dem import DemGrid


def _cfg(**kw):
    base = dict(nx=128, ny=128, tau=0.8, dtype="float32", max_disks=24,
                kn=2.0, gamma_n=1.0, gamma_t=0.3, mu=0.4, rho_s=2.0,
                n_sub=10, bc_west="wall", bc_east="wall", g_py=-1e-4,
                buoyancy=False)
    base.update(kw)
    return SimConfig(**base)


def _disks(cfg, n, r=3.0, seed=0, lo=6.0, hi=None):
    rng = np.random.default_rng(seed)
    specs = [DiskSpec(rng.uniform(lo, hi or cfg.nx - 6),
                      rng.uniform(lo, hi or cfg.ny - 6), r,
                      rng.uniform(-0.05, 0.05), rng.uniform(-0.05, 0.05),
                      rng.uniform(-0.01, 0.01)) for _ in range(n)]
    return dem.make_disk_state(specs, cfg, "float32")


def test_slab_subcycle_matches_oracle():
    cfg = _cfg()
    disks = _disks(cfg, 24, r=3.0, seed=3, lo=20.0, hi=60.0)  # dense
    grid = DemGrid.build(cfg, 3.0)
    fh = jnp.zeros((24, 2), jnp.float32)
    th = jnp.zeros((24,), jnp.float32)
    d_ref, ovf_r, nc_ref = jax.jit(dem.dem_subcycle, static_argnums=(3, 4))(
        disks, fh, th, grid, cfg)
    d_pal, ovf_p, nc = jax.jit(pallas_dem.dem_subcycle, static_argnums=(3, 4))(
        disks, fh, th, grid, cfg)
    assert int(ovf_p) == 0
    np.testing.assert_allclose(np.asarray(d_pal.x), np.asarray(d_ref.x),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(d_pal.v), np.asarray(d_ref.v),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(d_pal.omega), np.asarray(d_ref.omega),
                               rtol=0, atol=2e-5)
    # contact count uses the oracle's semantics: max over force evals
    # (initial state included) of the global pair count
    assert int(nc) > 0
    assert int(nc) == int(nc_ref)


@pytest.mark.parametrize("axis", ["y", "x"])
def test_slab_periodic_wrap_parity(axis):
    """Periodic-x wrap through the slab kernel vs the XLA oracle, under
    BOTH plane orientations: axis='y' wraps the LANE axis (roll+select
    partner fix), axis='x' wraps the SUBLANE axis (ghost guard rows
    refreshed per substep). The scene has a contact pair touching
    THROUGH the seam and a disk drifting across it mid-subcycle."""
    cfg = _cfg(nx=128, ny=96, max_disks=6, n_sub=6,
               bc_west="periodic", bc_east="periodic")
    specs = [
        DiskSpec(126.0, 40.0, 3.5, vx=0.05),
        DiskSpec(2.5, 41.0, 3.5, vx=-0.02),   # touches #0 through the seam
        DiskSpec(60.0, 40.0, 3.0),
        DiskSpec(63.5, 44.0, 3.0),            # bulk contact pair
        DiskSpec(127.2, 70.0, 2.5, vx=0.08),  # crosses mid-subcycle
        DiskSpec(30.0, 20.0, 2.5, vy=0.03),
    ]
    disks = dem.make_disk_state(specs, cfg, "float32")
    grid = DemGrid.build(cfg, 3.5)
    assert grid.wrap_lx == cfg.nx
    assert pallas_dem.slab_supported(grid, axis)
    rng = np.random.default_rng(2)
    fh = jnp.asarray(rng.uniform(-1e-3, 1e-3, (6, 2)), jnp.float32)
    th = jnp.asarray(rng.uniform(-1e-4, 1e-4, (6,)), jnp.float32)
    d_ref, _, nc_ref = jax.jit(dem.dem_subcycle, static_argnums=(3, 4))(
        disks, fh, th, grid, cfg)
    d_pal, ovf, nc = jax.jit(
        pallas_dem.dem_subcycle, static_argnums=(3, 4, 5))(
        disks, fh, th, grid, cfg, axis)
    assert int(ovf) == 0
    assert int(nc) == int(nc_ref) and int(nc) >= 2
    np.testing.assert_allclose(np.asarray(d_pal.x), np.asarray(d_ref.x),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(d_pal.v), np.asarray(d_ref.v),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(d_pal.omega),
                               np.asarray(d_ref.omega), rtol=0, atol=2e-5)


@pytest.mark.parametrize("axis", ["y", "x"])
def test_slab_fully_periodic_parity(axis):
    """Both axes wrapped (suspension box): lane roll-wrap + sublane
    ghost rows compose; a corner-straddling contact pair must match."""
    cfg = _cfg(nx=128, ny=96, max_disks=4, n_sub=5,
               bc_west="periodic", bc_east="periodic",
               bc_south="periodic", bc_north="periodic", g_py=0.0)
    specs = [
        DiskSpec(126.8, 94.5, 3.5, vx=0.03, vy=0.02),   # domain corner
        DiskSpec(2.0, 1.5, 3.5, vx=-0.01),  # touches #0 through BOTH seams
        DiskSpec(50.0, 50.0, 3.0),
        DiskSpec(55.5, 52.0, 3.0),
    ]
    disks = dem.make_disk_state(specs, cfg, "float32")
    grid = DemGrid.build(cfg, 3.5)
    assert grid.wrap_lx and grid.wrap_ly
    assert pallas_dem.slab_supported(grid, axis)
    z2 = jnp.zeros((4, 2), jnp.float32)
    z1 = jnp.zeros((4,), jnp.float32)
    d_ref, _, nc_ref = jax.jit(dem.dem_subcycle, static_argnums=(3, 4))(
        disks, z2, z1, grid, cfg)
    d_pal, ovf, nc = jax.jit(
        pallas_dem.dem_subcycle, static_argnums=(3, 4, 5))(
        disks, z2, z1, grid, cfg, axis)
    assert int(ovf) == 0
    assert int(nc) == int(nc_ref) and int(nc) >= 2
    np.testing.assert_allclose(np.asarray(d_pal.x), np.asarray(d_ref.x),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(d_pal.v), np.asarray(d_ref.v),
                               rtol=0, atol=2e-5)


@pytest.mark.slow
def test_slab_subcycle_with_hydro_and_gravity():
    cfg = _cfg(buoyancy=True, g_py=-2e-4, max_disks=12)
    disks = _disks(cfg, 12, r=3.0, seed=5)
    grid = DemGrid.build(cfg, 3.0)
    rng = np.random.default_rng(1)
    fh = jnp.asarray(rng.uniform(-1e-3, 1e-3, (12, 2)), jnp.float32)
    th = jnp.asarray(rng.uniform(-1e-4, 1e-4, (12,)), jnp.float32)
    d_ref, *_ = jax.jit(dem.dem_subcycle, static_argnums=(3, 4))(
        disks, fh, th, grid, cfg)
    d_pal, ovf, _ = jax.jit(pallas_dem.dem_subcycle, static_argnums=(3, 4))(
        disks, fh, th, grid, cfg)
    assert int(ovf) == 0
    np.testing.assert_allclose(np.asarray(d_pal.x), np.asarray(d_ref.x),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(d_pal.v), np.asarray(d_ref.v),
                               rtol=0, atol=2e-5)


@pytest.mark.slow
@pytest.mark.parametrize("axis", ["y", "x"])
def test_slab_axis_parity_sparse_column(axis):
    """A narrow column (sparse in x, like the headline collapse) must
    match the oracle under BOTH plane orientations - 'x' exercises the
    transposed layout where occupancy banding skips most strips."""
    cfg = _cfg(max_disks=32, n_sub=8)
    rng = np.random.default_rng(11)
    specs = [DiskSpec(rng.uniform(8.0, 28.0), rng.uniform(8.0, 120.0), 3.0,
                      rng.uniform(-0.05, 0.05), rng.uniform(-0.05, 0.05),
                      rng.uniform(-0.01, 0.01)) for _ in range(32)]
    disks = dem.make_disk_state(specs, cfg, "float32")
    grid = DemGrid.build(cfg, 3.0)
    assert pallas_dem.choose_axis(specs, cfg) == "x"
    fh = jnp.zeros((32, 2), jnp.float32)
    th = jnp.zeros((32,), jnp.float32)
    d_ref, ovf_r, _ = jax.jit(dem.dem_subcycle, static_argnums=(3, 4))(
        disks, fh, th, grid, cfg)
    d_pal, ovf_p, _ = jax.jit(
        pallas_dem.dem_subcycle, static_argnums=(3, 4, 5))(
        disks, fh, th, grid, cfg, axis)
    assert int(ovf_p) == 0
    np.testing.assert_allclose(np.asarray(d_pal.x), np.asarray(d_ref.x),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(d_pal.v), np.asarray(d_ref.v),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(d_pal.omega),
                               np.asarray(d_ref.omega), rtol=0, atol=2e-5)


@pytest.mark.slow  # ~34 s; subcycle_matches_oracle covers the quick lane
def test_slab_polydisperse_parity():
    """Mixed radii (r in [2, 5]): per-slot radii drive pair overlap,
    mass and inertia in the kernel - must match the oracle."""
    cfg = _cfg(max_disks=20, n_sub=6)
    rng = np.random.default_rng(17)
    specs = [DiskSpec(rng.uniform(14.0, 70.0), rng.uniform(14.0, 70.0),
                      float(rng.uniform(2.0, 5.0)),
                      rng.uniform(-0.05, 0.05), rng.uniform(-0.05, 0.05),
                      rng.uniform(-0.01, 0.01)) for _ in range(20)]
    disks = dem.make_disk_state(specs, cfg, "float32")
    grid = DemGrid.build(cfg, 5.0)
    fh = jnp.zeros((20, 2), jnp.float32)
    th = jnp.zeros((20,), jnp.float32)
    d_ref, ovf_r, _ = jax.jit(dem.dem_subcycle, static_argnums=(3, 4))(
        disks, fh, th, grid, cfg)
    d_pal, ovf_p, nc = jax.jit(pallas_dem.dem_subcycle, static_argnums=(3, 4))(
        disks, fh, th, grid, cfg)
    assert int(ovf_p) == 0
    np.testing.assert_allclose(np.asarray(d_pal.x), np.asarray(d_ref.x),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(d_pal.v), np.asarray(d_ref.v),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(d_pal.omega),
                               np.asarray(d_ref.omega), rtol=0, atol=2e-5)


def test_slab_overflow_fallback_integrates():
    """Disks that overflow the SLAB_K=4 per-cell slots must not freeze:
    they fall back to a contact-free Verlet (hydro + body + walls), so
    a crammed cell's extra disks still accelerate under gravity."""
    cfg = _cfg(max_disks=8, n_sub=4)
    # 6 disks inside one broadphase cell (cell_size = 2*1 + 1 = 3)
    specs = [DiskSpec(60.0 + 0.3 * i, 60.0 + 0.2 * i, 1.0)
             for i in range(6)]
    disks = dem.make_disk_state(specs, cfg, "float32")
    grid = DemGrid.build(cfg, 1.0)
    fh = jnp.zeros((8, 2), jnp.float32)
    th = jnp.zeros((8,), jnp.float32)
    d_pal, ovf, _ = jax.jit(pallas_dem.dem_subcycle, static_argnums=(3, 4))(
        disks, fh, th, grid, cfg)
    assert int(ovf) == 2
    # the stable (cid, iota) sort slots disks 0-3; 4 and 5 overflow.
    # With no contacts in the fallback their Verlet is exact:
    # v_y = g_py * 1 LBM step, y drops by g_py*(1+1/n_sub)/2.
    vy = np.asarray(d_pal.v[4:6, 1])
    np.testing.assert_allclose(vy, cfg.g_py, rtol=1e-4)
    assert (np.asarray(d_pal.x[4:6, 1]) < 60.0 + 0.2 * np.arange(4, 6)).all()


def test_slab_band_table():
    """Occupancy table marks exactly the strips that hold disks."""
    cfg = _cfg(max_disks=3)
    specs = [DiskSpec(20.0, 20.0, 3.0), DiskSpec(24.0, 20.0, 3.0),
             DiskSpec(100.0, 110.0, 3.0)]
    disks = dem.make_disk_state(specs, cfg, "float32")
    grid = DemGrid.build(cfg, 3.0)
    body = dem.body_forces(disks, cfg)
    z2 = jnp.zeros((3, 2), jnp.float32)
    z1 = jnp.zeros((3,), jnp.float32)
    _, _, _, _, n_occ, offs = pallas_dem.build_slabs(
        disks, z2, z1, body, grid, "y")
    ncs, ncl, R, C, nb = pallas_dem.slab_dims(grid, "y")
    offs = np.asarray(offs)
    cys = np.floor((np.array([20.0, 20.0, 110.0]) + 0.5) / grid.cell_size)
    assert int(n_occ) == len({int(c) // 8 for c in cys})
    # occupied offsets are in-range interior rows; the rest are sentinel
    assert (offs[: int(n_occ)] >= 8).all()
    assert (offs[: int(n_occ)] <= R - 16).all()
    assert (offs[int(n_occ):] == R).all()


@pytest.mark.slow  # ~32 s; subcycle_matches_oracle covers the quick lane
def test_slab_wall_contact():
    """Disk resting on the south wall stays put in both paths."""
    cfg = _cfg(g_py=-1e-3, gamma_n=8.0, n_sub=20)
    disks = dem.make_disk_state([DiskSpec(64.0, 2.4, 3.0)], cfg, "float32")
    grid = DemGrid.build(cfg, 3.0)
    fh = jnp.zeros((1, 2), jnp.float32)
    th = jnp.zeros((1,), jnp.float32)
    sub_r = jax.jit(dem.dem_subcycle, static_argnums=(3, 4))
    sub_p = jax.jit(pallas_dem.dem_subcycle, static_argnums=(3, 4))
    dr, dp = disks, disks
    for _ in range(5):
        dr, *_ = sub_r(dr, fh, th, grid, cfg)
        dp, *_ = sub_p(dp, fh, th, grid, cfg)
    np.testing.assert_allclose(np.asarray(dp.x), np.asarray(dr.x), atol=5e-5)
