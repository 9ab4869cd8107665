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
    cfg = _cfg(n_sub=6)  # cost ~ n_sub in interpret; 6 keeps multi-substep
    # contact evolution while trimming the quick lane (r5)
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


@pytest.mark.slow  # ~36 s/axis interpret; the quick lane's in-kernel
# wrap coverage is test_slab_fully_periodic_parity[y], which composes
# BOTH wrap mechanisms (lane roll-wrap + sublane ghost rows) in one run
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


@pytest.mark.slow  # ~60-78 s/axis interpret builds; quick-lane wrap
# coverage rides the oracle/sharded seam tests in test_periodic.py
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


@pytest.mark.slow  # ~76 s interpret build (ncs%8 geometry); the masked
# count is also pinned by the fully-periodic parity tests
def test_slab_wrap_ghost_rows_not_counted():
    """Regression: with ncs % 8 != 0 the top ghost guard rows share an
    8-row band with the last real rows; they hold REAL copies (r > 0)
    so they pass pair()'s touching test as i-disks, and the contact
    count must mask them out (their forces/xi are discarded at exit,
    but nc fed SimState.n_contacts). Seam pairs near BOTH edges made
    the unmasked kernel report nc=4+ vs the oracle's 3."""
    cfg = _cfg(nx=128, ny=96, max_disks=6, n_sub=4, g_py=0.0,
               bc_south="periodic", bc_north="periodic")
    specs = [
        DiskSpec(40.0, 94.8, 3.5),
        DiskSpec(40.5, 2.0, 3.5),    # touches #0 through the y seam
        DiskSpec(80.0, 1.0, 3.0),
        DiskSpec(80.2, 93.5, 3.2),   # second seam pair
        DiskSpec(60.0, 50.0, 3.0),
        DiskSpec(63.0, 53.0, 3.0),   # bulk pair
    ]
    disks = dem.make_disk_state(specs, cfg, "float32")
    grid = DemGrid.build(cfg, 3.5)
    ncs, _, _, _, _ = pallas_dem.slab_dims(grid, "y")
    assert ncs % 8 != 0  # the scene must exercise the unaligned guard
    z2 = jnp.zeros((6, 2), jnp.float32)
    z1 = jnp.zeros((6,), jnp.float32)
    d_ref, _, nc_ref = jax.jit(dem.dem_subcycle, static_argnums=(3, 4))(
        disks, z2, z1, grid, cfg)
    d_pal, ovf, nc = jax.jit(
        pallas_dem.dem_subcycle, static_argnums=(3, 4, 5))(
        disks, z2, z1, grid, cfg, "y")
    assert int(ovf) == 0
    assert int(nc) == int(nc_ref) and int(nc) >= 3
    np.testing.assert_allclose(np.asarray(d_pal.x), np.asarray(d_ref.x),
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


@pytest.mark.slow  # ~98 s interpret build; slab-core quick coverage is
# test_slab_subcycle_matches_oracle
def test_slab_overflow_fallback_integrates():
    """Disks that overflow the SLAB_K=4 per-cell slots must not freeze:
    they fall back to a contact-free Verlet (hydro + body + walls), so
    a crammed cell's extra disks still accelerate under gravity."""
    # 64^2 domain: interpret-mode kernel cost scales with the cell-plane
    # area, and the overflow semantics only need one crammed cell
    cfg = _cfg(nx=64, ny=64, max_disks=8, n_sub=4)
    # 6 disks inside one broadphase cell (cell_size = 2*1 + 1 = 3)
    specs = [DiskSpec(30.0 + 0.3 * i, 30.0 + 0.2 * i, 1.0)
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
    assert (np.asarray(d_pal.x[4:6, 1]) < 30.0 + 0.2 * np.arange(4, 6)).all()


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
    _, _, _, _, n_occ, offs, _ = pallas_dem.build_slabs(
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


def _spring_set(d):
    """{(i, j): xi} of the NONZERO pair springs in a DiskState carry
    (format-independent: the oracle stores its whole candidate list with
    zero stretches for non-touching pairs; the slab stores only live
    springs)."""
    ct_j = np.asarray(d.ct_j)
    ct_xi = np.asarray(d.ct_xi)
    out = {}
    for i in range(ct_j.shape[0]):
        for s in range(ct_j.shape[1]):
            if ct_j[i, s] >= 0 and ct_xi[i, s] != 0.0:
                out[(i, int(ct_j[i, s]))] = float(ct_xi[i, s])
    return out


@pytest.mark.parametrize("mu", [
    0.8, pytest.param(0.05, marks=pytest.mark.slow)])
def test_slab_kt_history_matches_oracle(mu):
    """kt > 0 in-kernel Cundall-Strack springs vs the XLA oracle over
    THREE LBM steps (exercises the cross-step rematch through
    ct_j/ct_xi, the per-substep slip-consistent truncation - mu=0.05
    makes the Coulomb cap bind - and wall springs)."""
    cfg = _cfg(max_disks=8, kt=0.5, gamma_t=0.2, mu=mu, n_sub=4,
               g_py=-2e-4)
    specs = [
        DiskSpec(30.0, 5.8, 3.0),                 # rests on south wall
        DiskSpec(35.5, 6.2, 3.0, omega=0.2),      # touches #0, spins
        DiskSpec(60.0, 40.0, 3.0, vx=0.03),
        DiskSpec(65.5, 41.0, 3.0, vx=-0.03),      # head-on pair
        DiskSpec(90.0, 90.0, 2.5, vy=-0.05),
        DiskSpec(90.0, 84.5, 2.5),                # vertical pair
        DiskSpec(15.0, 100.0, 2.5),               # free flier
        DiskSpec(100.3, 20.0, 3.0, omega=-0.1),
    ]
    disks = dem.make_disk_state(specs, cfg, "float32")
    grid = DemGrid.build(cfg, 3.0)
    z2 = jnp.zeros((8, 2), jnp.float32)
    z1 = jnp.zeros((8,), jnp.float32)
    sub_r = jax.jit(dem.dem_subcycle, static_argnums=(3, 4))
    sub_p = jax.jit(pallas_dem.dem_subcycle, static_argnums=(3, 4))
    dr, dp = disks, disks
    # 2 LBM steps suffice: step 1 builds springs, step 2 exercises the
    # cross-step rematch (interpret-mode cost scales with step count;
    # the 3-handoff variant runs compiled in tools/validate_tpu.py)
    for step in range(2):
        dr, _, nc_r = sub_r(dr, z2, z1, grid, cfg)
        dp, ovf, nc_p = sub_p(dp, z2, z1, grid, cfg)
        assert int(ovf) == 0
        assert int(nc_p) == int(nc_r)
        np.testing.assert_allclose(np.asarray(dp.x), np.asarray(dr.x),
                                   rtol=0, atol=3e-5, err_msg=f"step {step}")
        np.testing.assert_allclose(np.asarray(dp.v), np.asarray(dr.v),
                                   rtol=0, atol=3e-5)
        np.testing.assert_allclose(np.asarray(dp.omega),
                                   np.asarray(dr.omega), rtol=0, atol=3e-5)
        np.testing.assert_allclose(np.asarray(dp.wall_xi),
                                   np.asarray(dr.wall_xi), rtol=0, atol=3e-5)
        sr, sp = _spring_set(dr), _spring_set(dp)
        assert set(sp) == set(sr), f"step {step}: spring pairs diverge"
        for k in sr:
            assert abs(sp[k] - sr[k]) < 3e-5, (step, k, sp[k], sr[k])
    assert _spring_set(dr), "scene never built a spring - test is vacuous"


@pytest.mark.slow  # ~90 s interpret (4 slab programs); the quick lane's
# slim-window coverage is test_coupled_window_matches_windowed_oracle
# (kt=0); this adds the spring-channel offsets
def test_slab_kt_window_matches_per_step():
    """dem_subcycle_window (the coupling-cadence slim 8-channel layout:
    no baked force channels, springs at channel 8) with kt > 0 vs two
    per-step slab subcycles. With window travel below a cell width the
    frozen slot assignment equals the per-step rebuild, so positions,
    velocities, wall springs and the pair-spring set must agree to
    float tolerance - this pins the slim layout's spring-channel
    offsets and the force-plane read path."""
    cfg = _cfg(max_disks=8, kt=0.5, gamma_t=0.2, mu=0.4, n_sub=6,
               g_py=-2e-4)
    specs = [
        DiskSpec(30.0, 5.8, 3.0),                 # rests on south wall
        DiskSpec(35.5, 6.2, 3.0, omega=0.2),      # touches #0, spins
        DiskSpec(60.0, 40.0, 3.0, vx=0.03),
        DiskSpec(65.5, 41.0, 3.0, vx=-0.03),      # head-on pair
        DiskSpec(90.0, 90.0, 2.5, vy=-0.05),
        DiskSpec(90.0, 84.5, 2.5),                # vertical pair
        DiskSpec(15.0, 100.0, 2.5),               # free flier
        DiskSpec(100.3, 20.0, 3.0, omega=-0.1),
    ]
    disks = dem.make_disk_state(specs, cfg, "float32")
    grid = DemGrid.build(cfg, 3.0)
    rng = np.random.default_rng(5)
    fh = [jnp.asarray(rng.uniform(-1e-3, 1e-3, (8, 2)), jnp.float32)
          for _ in range(2)]
    th = [jnp.asarray(rng.uniform(-1e-4, 1e-4, (8,)), jnp.float32)
          for _ in range(2)]
    sub_p = jax.jit(pallas_dem.dem_subcycle, static_argnums=(3, 4))
    dp = disks
    for t in range(2):
        dp, ovf, _ = sub_p(dp, fh[t], th[t], grid, cfg)
        assert int(ovf) == 0
    dw, ovf_w, nc_w = jax.jit(
        pallas_dem.dem_subcycle_window, static_argnums=(2, 3))(
        disks, [(fh[0], th[0]), (fh[1], th[1])], grid, cfg)
    assert int(ovf_w) == 0 and int(nc_w) > 0
    np.testing.assert_allclose(np.asarray(dw.x), np.asarray(dp.x),
                               rtol=0, atol=3e-5)
    np.testing.assert_allclose(np.asarray(dw.v), np.asarray(dp.v),
                               rtol=0, atol=3e-5)
    np.testing.assert_allclose(np.asarray(dw.omega), np.asarray(dp.omega),
                               rtol=0, atol=3e-5)
    np.testing.assert_allclose(np.asarray(dw.wall_xi),
                               np.asarray(dp.wall_xi), rtol=0, atol=3e-5)
    sr, sw = _spring_set(dp), _spring_set(dw)
    assert set(sw) == set(sr) and sr, "spring sets diverge (or vacuous)"
    for k in sr:
        assert abs(sw[k] - sr[k]) < 3e-5, (k, sw[k], sr[k])


@pytest.mark.slow  # interpret-mode slab builds (~2 min)
def test_slab_kt_periodic_wrap():
    """Springs persist across the periodic seam: a pair touching
    through the x wrap keeps its stretch through the slab rematch."""
    cfg = _cfg(nx=128, ny=96, max_disks=3, kt=0.4, gamma_t=0.2, mu=0.9,
               n_sub=6, g_py=0.0, bc_west="periodic", bc_east="periodic")
    specs = [
        DiskSpec(126.5, 40.0, 3.0, omega=0.15),
        DiskSpec(2.0, 41.0, 3.0),        # touches #0 through the seam
        DiskSpec(60.0, 60.0, 2.5),
    ]
    disks = dem.make_disk_state(specs, cfg, "float32")
    grid = DemGrid.build(cfg, 3.0)
    z2 = jnp.zeros((3, 2), jnp.float32)
    z1 = jnp.zeros((3,), jnp.float32)
    sub_r = jax.jit(dem.dem_subcycle, static_argnums=(3, 4))
    sub_p = jax.jit(pallas_dem.dem_subcycle, static_argnums=(3, 4, 5))
    dr, dp = disks, disks
    for _ in range(2):
        dr, _, _ = sub_r(dr, z2, z1, grid, cfg)
        dp, ovf, _ = sub_p(dp, z2, z1, grid, cfg, "y")
        assert int(ovf) == 0
    np.testing.assert_allclose(np.asarray(dp.x), np.asarray(dr.x),
                               rtol=0, atol=3e-5)
    np.testing.assert_allclose(np.asarray(dp.omega), np.asarray(dr.omega),
                               rtol=0, atol=3e-5)
    sr, sp = _spring_set(dr), _spring_set(dp)
    assert (0, 1) in sr and set(sp) == set(sr)


@pytest.mark.slow  # interpret-mode slab builds (~2 min)
def test_slab_kt_interop_with_oracle():
    """Mid-run path handoff: XLA step -> slab step == 2 XLA steps (the
    spring carry formats interoperate)."""
    cfg = _cfg(max_disks=4, kt=0.5, gamma_t=0.2, mu=0.8, n_sub=6,
               g_py=-2e-4)
    specs = [
        DiskSpec(30.0, 5.8, 3.0),
        DiskSpec(35.5, 6.2, 3.0, omega=0.2),
        DiskSpec(60.0, 40.0, 3.0, vx=0.03),
        DiskSpec(65.5, 41.0, 3.0, vx=-0.03),
    ]
    disks = dem.make_disk_state(specs, cfg, "float32")
    grid = DemGrid.build(cfg, 3.0)
    z2 = jnp.zeros((4, 2), jnp.float32)
    z1 = jnp.zeros((4,), jnp.float32)
    sub_r = jax.jit(dem.dem_subcycle, static_argnums=(3, 4))
    sub_p = jax.jit(pallas_dem.dem_subcycle, static_argnums=(3, 4))
    d1, _, _ = sub_r(disks, z2, z1, grid, cfg)
    d_mix, _, _ = sub_p(d1, z2, z1, grid, cfg)
    d_ref, _, _ = sub_r(d1, z2, z1, grid, cfg)
    np.testing.assert_allclose(np.asarray(d_mix.x), np.asarray(d_ref.x),
                               rtol=0, atol=3e-5)
    np.testing.assert_allclose(np.asarray(d_mix.v), np.asarray(d_ref.v),
                               rtol=0, atol=3e-5)
    sr, sp = _spring_set(d_ref), _spring_set(d_mix)
    assert set(sp) == set(sr) and sr


@pytest.mark.slow  # interpret-mode fused coupled build (~2 min)
def test_simulation_friction_slab_matches_oracle():
    """End-to-end Simulation with kt > 0: the Pallas path (slab DEM with
    in-kernel springs + fused IMB) vs the XLA oracle path over 3 coupled
    steps - exercises the use_slab_dem gate wiring, hydro forces feeding
    the spring subcycle, and the cross-step rematch inside the jitted
    step."""
    from lbmdem_tpu.simulation import Simulation, make_step_fn

    cfg = SimConfig(nx=128, ny=128, tau=0.8, dtype="float32", g_py=-2e-4,
                    rho_s=2.5, kn=2.0, gamma_n=1.0, kt=0.5, gamma_t=0.2,
                    mu=0.5, n_sub=6, bc_west="wall", bc_east="wall")
    specs = [DiskSpec(60.0, 9.0, 4.0, omega=0.1),
             DiskSpec(67.5, 10.0, 4.0),
             DiskSpec(64.0, 40.0, 4.0, vy=-0.02)]
    ref = Simulation(cfg, specs)
    pal = Simulation(cfg, specs, use_pallas=True)
    step_r = jax.jit(make_step_fn(ref.cfg, ref.grid, False))
    step_p = jax.jit(make_step_fn(pal.cfg, pal.grid, True))
    sr, sp = ref.state, pal.state
    for _ in range(3):
        sr = step_r(sr)
        sp = step_p(sp)
    assert int(sp.overflow) == 0
    np.testing.assert_allclose(np.asarray(sp.disks.x), np.asarray(sr.disks.x),
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(sp.disks.v), np.asarray(sr.disks.v),
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(sp.disks.omega),
                               np.asarray(sr.disks.omega), rtol=0, atol=5e-5)
    sr_set, sp_set = _spring_set(sr.disks), _spring_set(sp.disks)
    assert set(sp_set) == set(sr_set) and sr_set
