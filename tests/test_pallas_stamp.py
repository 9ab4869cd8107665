"""Pallas tile-binned stamp/reduce vs the oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbmdem_tpu.config import SimConfig, window_for_radius
from lbmdem_tpu.ops import imb, lbm
from lbmdem_tpu.ops import pallas_stamp as ps


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(ps, "_INTERPRET", True)


def _setup(n=24, seed=1, method="sample"):
    rng = np.random.default_rng(seed)
    cfg = SimConfig(nx=256, ny=128, tau=0.8, dtype="float32", max_disks=n,
                    window=window_for_radius(4.0), tile_cap=64,
                    eps_method=method, bc_west="wall", bc_east="wall")
    xp = jnp.asarray(
        np.stack([rng.uniform(1.0, 255.0, n), rng.uniform(1.0, 127.0, n)], 1),
        jnp.float32,
    )
    vp = jnp.asarray(rng.uniform(-0.05, 0.05, (n, 2)), jnp.float32)
    om = jnp.asarray(rng.uniform(-0.01, 0.01, n), jnp.float32)
    r = jnp.asarray(rng.uniform(2.0, 4.0, n), jnp.float32)
    act = jnp.asarray(np.r_[np.ones(n - 4, bool), np.zeros(4, bool)])
    return cfg, xp, vp, om, r, act


@pytest.mark.parametrize("method", [
    "sample", "ramp",  # exact is the slow-marked accuracy tier (~10 s)
    pytest.param("exact", marks=pytest.mark.slow)])
def test_stamp_matches_oracle(method):
    cfg, xp, vp, om, r, act = _setup(method=method)
    e1, ux1, uy1 = imb.stamp_solid_fraction(xp, vp, om, r, act, cfg)
    e2, ux2, uy2, ovf = ps.stamp_solid_fraction(xp, vp, om, r, act, cfg)
    assert int(ovf) == 0
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ux1), np.asarray(ux2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(uy1), np.asarray(uy2), atol=1e-6)


def test_stamp_matches_oracle_with_r_shift():
    """The eps_r_shift hydrodynamic-radius calibration must hit the
    kernel and oracle coverage identically (same shifted-r sample
    membership), and actually shrink the stamped area."""
    cfg, xp, vp, om, r, act = _setup()
    cfg = cfg.replace(eps_r_shift=-0.4)
    e1, ux1, uy1 = imb.stamp_solid_fraction(xp, vp, om, r, act, cfg)
    e2, _, _, ovf = ps.stamp_solid_fraction(xp, vp, om, r, act, cfg)
    assert int(ovf) == 0
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-6)
    e0, _, _ = imb.stamp_solid_fraction(
        xp, vp, om, r, act, cfg.replace(eps_r_shift=0.0))
    assert float(jnp.sum(e1)) < 0.9 * float(jnp.sum(e0))


@pytest.mark.parametrize("r", [
    pytest.param(8.0, marks=pytest.mark.slow),   # bh 32, ~41 s interpret
    pytest.param(14.0, marks=pytest.mark.slow),  # bh 40, ~13 s interpret
])
def test_stamp_reduce_band_heights(r):
    """Large stamp windows exercise the taller per-disk bands of the
    banded kernel loops (band_height: window 21 -> bh 32, window 33 ->
    bh 40 on 64-row tiles) including clipping at tile edges - the
    production headline config runs r=8/bh=32, which the r<=4 (bh=24)
    parity tests above never reach."""
    n = 10
    rng = np.random.default_rng(11)
    cfg = SimConfig(nx=256, ny=128, tau=0.8, dtype="float32", max_disks=n,
                    window=window_for_radius(r), tile_cap=64,
                    bc_west="wall", bc_east="wall")
    from lbmdem_tpu.ops.pallas_stamp import band_height, tile_dims
    th, _ = tile_dims(cfg)
    assert band_height(cfg.window, th) == (32 if r == 8.0 else 40)
    xp = jnp.asarray(
        np.stack([rng.uniform(1.0, 255.0, n), rng.uniform(1.0, 127.0, n)], 1),
        jnp.float32,
    )
    vp = jnp.asarray(rng.uniform(-0.05, 0.05, (n, 2)), jnp.float32)
    om = jnp.asarray(rng.uniform(-0.01, 0.01, n), jnp.float32)
    rr = jnp.full((n,), r, jnp.float32)
    act = jnp.ones((n,), bool)
    e1, ux1, uy1 = imb.stamp_solid_fraction(xp, vp, om, rr, act, cfg)
    e2, ux2, uy2, ovf = ps.stamp_solid_fraction(xp, vp, om, rr, act, cfg)
    assert int(ovf) == 0
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ux1), np.asarray(ux2), atol=1e-5)
    f = lbm.init_equilibrium(cfg) * (
        1.0 + 0.02 * jnp.asarray(rng.standard_normal((9, 128, 256)), jnp.float32)
    )
    _, phix, phiy = imb.collide_imb(f, e1, ux1, uy1, cfg)
    F1, T1 = imb.reduce_hydro_forces(xp, rr, act, e1, phix, phiy, cfg)
    b = ps.bin_disks_to_tiles(xp, vp, om, rr, act, cfg)
    F2, T2 = ps.reduce_hydro_forces(
        xp, rr, act, e1, phix, phiy, cfg, b[0], b[1], b[2]
    )
    # f32 summation-order noise scales with the window (torque terms
    # reach ~5e2 at r=14): compare relative to the per-disk magnitude
    np.testing.assert_allclose(np.asarray(F1), np.asarray(F2),
                               rtol=1e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(T1), np.asarray(T2),
                               rtol=1e-5, atol=5e-4)


@pytest.mark.slow
def test_stamp_edge_disks():
    """Disks overlapping the domain boundary (windows partly outside)."""
    cfg, *_ = _setup()
    xp = jnp.asarray([[1.0, 1.0], [254.0, 126.0], [128.0, 0.5]], jnp.float32)
    vp = jnp.zeros((3, 2), jnp.float32)
    om = jnp.zeros((3,), jnp.float32)
    r = jnp.asarray([3.0, 3.5, 2.5], jnp.float32)
    act = jnp.ones((3,), bool)
    cfg = cfg.replace(max_disks=3)
    e1, _, _ = imb.stamp_solid_fraction(xp, vp, om, r, act, cfg)
    e2, _, _, ovf = ps.stamp_solid_fraction(xp, vp, om, r, act, cfg)
    assert int(ovf) == 0
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-6)


@pytest.mark.parametrize("method", [
    "sample", "ramp",
    pytest.param("exact", marks=pytest.mark.slow)])
def test_reduce_matches_oracle(method):
    cfg, xp, vp, om, r, act = _setup(seed=3, method=method)
    rng = np.random.default_rng(7)
    eps, usx, usy = imb.stamp_solid_fraction(xp, vp, om, r, act, cfg)
    f = lbm.init_equilibrium(cfg) * (
        1.0 + 0.02 * jnp.asarray(rng.standard_normal((9, 128, 256)), jnp.float32)
    )
    _, phix, phiy = imb.collide_imb(f, eps, usx, usy, cfg)
    F1, T1 = imb.reduce_hydro_forces(xp, r, act, eps, phix, phiy, cfg)
    binned = ps.bin_disks_to_tiles(xp, vp, om, r, act, cfg)
    F2, T2 = ps.reduce_hydro_forces(
        xp, r, act, eps, phix, phiy, cfg, binned[0], binned[1], binned[2]
    )
    np.testing.assert_allclose(np.asarray(F1), np.asarray(F2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(T1), np.asarray(T2), atol=1e-6)


def test_bin_overflow_detected():
    cfg, xp, vp, om, r, act = _setup()
    cfg = cfg.replace(tile_cap=2)  # force overflow: >2 disks per tile
    xp = jnp.asarray([[64.0 + i, 64.0] for i in range(6)], jnp.float32)
    vp = jnp.zeros((6, 2), jnp.float32)
    om = jnp.zeros((6,), jnp.float32)
    r = jnp.full((6,), 2.0, jnp.float32)
    act = jnp.ones((6,), bool)
    cfg = cfg.replace(max_disks=6)
    *_, ovf = ps.bin_disks_to_tiles(xp, vp, om, r, act, cfg)
    assert int(ovf) > 0


@pytest.mark.slow
def test_fused_imb_reduce_matches_separate_passes():
    """fused_step_imb_reduce == fused_step_imb + reduce_hydro_forces."""
    from lbmdem_tpu.ops import pallas_lbm as pk

    cfg, xp, vp, om, r, act = _setup(seed=5)
    rng = np.random.default_rng(11)
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(pk, "_INTERPRET", True)
        eps, usx, usy, _ = ps.stamp_solid_fraction(xp, vp, om, r, act, cfg)
        f = lbm.init_equilibrium(cfg) * (
            1.0 + 0.02 * jnp.asarray(
                rng.standard_normal((9, 128, 256)), jnp.float32
            )
        )
        tile_data, counts, entry_slots, _ = ps.bin_disks_to_tiles(
            xp, vp, om, r, act, cfg
        )
        f1, phix, phiy = pk.fused_step_imb(f, eps, usx, usy, cfg)
        F1, T1 = ps.reduce_hydro_forces(
            xp, r, act, eps, phix, phiy, cfg, tile_data, counts, entry_slots
        )
        f2, partials = pk.fused_step_imb_reduce(
            f, eps, usx, usy, cfg, tile_data, counts
        )
        F2, T2 = ps.gather_partials(partials, entry_slots, xp.dtype)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_allclose(np.asarray(F1), np.asarray(F2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(T1), np.asarray(T2), atol=1e-6)


@pytest.mark.slow  # ~58 s; the fused-vs-separate + stamp/reduce parities
def test_coupled_step_pallas_path_matches_oracle():  # cover the quick lane
    """Full coupled step via Simulation(use_pallas=True) vs oracle path
    (stamp+reduce kernels swapped in; lattice still oracle on CPU)."""
    from lbmdem_tpu.config import DiskSpec
    from lbmdem_tpu.simulation import Simulation, make_step_fn

    # tile_cap pinned small: Simulation would derive ~600 from r_min,
    # and interpret-mode kernel loops execute per-slot (wall-time!)
    cfg = SimConfig(nx=256, ny=128, tau=0.8, dtype="float32", g_py=-1e-4,
                    rho_s=2.0, kn=0.5, gamma_n=0.5, n_sub=5, tile_cap=64,
                    bc_west="wall", bc_east="wall")
    disks = [DiskSpec(64.3, 96.2, 4.0), DiskSpec(130.0, 64.0, 3.0, vx=0.01)]
    ref = Simulation(cfg, disks)
    pal = Simulation(cfg, disks, use_pallas=True)
    step_r = jax.jit(make_step_fn(ref.cfg, ref.grid, False))
    step_p = jax.jit(make_step_fn(pal.cfg, pal.grid, True))
    sr, sp = ref.state, pal.state
    for _ in range(3):
        sr = step_r(sr)
        sp = step_p(sp)
    np.testing.assert_allclose(np.asarray(sr.f), np.asarray(sp.f),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(sr.disks.x), np.asarray(sp.disks.x),
                               rtol=1e-6, atol=1e-7)
