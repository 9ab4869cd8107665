"""Zou/He open boundaries: west velocity inlet / east pressure outlet.

Beyond-reference capability (the reference drives flow with body forces
only): non-equilibrium bounce-back reconstruction of the three unknown
populations at open domain ends, enabling inflow/outflow channels and
the Schafer-Turek cylinder benchmark (with fixed obstacle disks).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbmdem_tpu import lattice
from lbmdem_tpu.config import DiskSpec, SimConfig
from lbmdem_tpu.ops import imb, lbm, pallas_lbm
from lbmdem_tpu.simulation import Simulation


@pytest.fixture()
def _interpret(monkeypatch):
    monkeypatch.setattr(pallas_lbm, "_INTERPRET", True)


def test_config_validation():
    with pytest.raises(ValueError, match="pair"):
        SimConfig(nx=32, ny=16, bc_west="inlet")
    with pytest.raises(ValueError, match="bad bc east"):
        SimConfig(nx=32, ny=16, bc_east="inlet")
    with pytest.raises(ValueError, match="inlet_profile"):
        SimConfig(nx=32, ny=16, bc_west="inlet", bc_east="outlet",
                  u_inlet=0.05, inlet_profile="plug")
    with pytest.raises(ValueError, match="u_inlet"):
        SimConfig(nx=32, ny=16, bc_west="inlet", bc_east="outlet",
                  u_inlet=0.7)
    # bf16 f-storage composes with open boundaries (the Zou/He closures
    # take the storage shift directly - lbm.zou_he_inlet)
    SimConfig(nx=128, ny=16, bc_west="inlet", bc_east="outlet",
              u_inlet=0.05, f_storage="bfloat16")
    # mobile disks with open boundaries are supported (outflow culling)
    Simulation(
        SimConfig(nx=64, ny=32, bc_west="inlet", bc_east="outlet",
                  u_inlet=0.05, max_disks=1),
        [DiskSpec(32.0, 16.0, 3.0)],
    )


def test_uniform_plug_flow_is_fixed_point():
    """Uniform equilibrium flow through inlet/outlet is an EXACT fixed
    point of the Zou/He closure (the reconstruction formulas reproduce
    the equilibrium identities)."""
    u = 0.05
    cfg = SimConfig(nx=32, ny=16, tau=0.8, dtype="float64",
                    bc_west="inlet", bc_east="outlet", u_inlet=u,
                    bc_south="periodic", bc_north="periodic", u0x=u)
    f0 = lbm.init_equilibrium(cfg)
    f = f0
    for _ in range(5):
        f = lbm.step_pure_fluid(f, cfg)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f0), atol=1e-15)


def test_zou_he_shift_identity():
    """The shifted-storage form of the closures is algebraically exact:
    running zou_he on g_i = f_i - w_i*sigma with shift=sigma equals the
    physical result minus the output populations' shifts. Checked in
    f64 to the identity's roundoff (the +sigma density-sum term and the
    pairwise weight cancellations, see lbm.zou_he_inlet docstring)."""
    rng = np.random.default_rng(11)
    f = lattice.W[:, None] * (1.0 + 0.05 * rng.standard_normal((9, 64)))
    sigma = 1.7
    g = f - sigma * lattice.W[:, None]
    uw = 0.04 * rng.standard_normal(64)
    n_phys = lbm.zou_he_inlet(tuple(f), uw)
    n_shft = lbm.zou_he_inlet(tuple(g), uw, shift=sigma)
    for i, (p, s) in zip((1, 5, 8), zip(n_phys, n_shft)):
        np.testing.assert_allclose(np.asarray(s) + sigma * lattice.W[i],
                                   np.asarray(p), rtol=1e-13)
    m_phys = lbm.zou_he_outlet(tuple(f), 1.05)
    m_shft = lbm.zou_he_outlet(tuple(g), 1.05, shift=sigma)
    for i, (p, s) in zip((3, 7, 6), zip(m_phys, m_shft)):
        np.testing.assert_allclose(np.asarray(s) + sigma * lattice.W[i],
                                   np.asarray(p), rtol=1e-13)


@pytest.mark.slow  # r5 lane trim: the bf16 x Zou/He composition keeps a
# quick rep in test_sharding.py::test_pallas_sharded_fluid_bf16_openbc,
# and plain openbc / plain bf16 kernel parity each stay quick
def test_openbc_bf16_kernel_parity(_interpret):
    """Zou/He + shifted-bf16 f storage on the fused kernel vs the
    quantized oracle (dequantize -> f32 oracle step -> requantize).
    Tolerance is ~1 bf16 ulp of the residual scale, as in the closed-box
    bf16 parity tests: summation order differs between the paths."""
    cfg = SimConfig(nx=128, ny=16, tau=0.8, dtype="float32",
                    f_storage="bfloat16", bc_west="inlet",
                    bc_east="outlet", u_inlet=0.05,
                    inlet_profile="poiseuille")
    rng = np.random.default_rng(7)
    base = lattice.W[:, None, None].astype(np.float32)
    f = jnp.asarray(
        base * (1.0 + 0.02 * rng.standard_normal((9, 16, 128))
                .astype(np.float32))
    )
    ref = got = lbm.to_storage(f, cfg)
    for _ in range(2):
        ref = lbm.to_storage(
            lbm.step_pure_fluid(lbm.from_storage(ref, cfg), cfg), cfg
        )
        got = pallas_lbm.fused_step_fluid(got, cfg)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=3e-4)


@pytest.mark.slow  # interpret-mode coupled build dominates
def test_openbc_coupled_bf16_matches_oracle(_interpret):
    """Open boundaries + a mobile disk + bf16 f storage end-to-end:
    Simulation(use_pallas) vs the oracle path (same per-step storage
    quantization), including the boundary-column solid masking and the
    outflow-culling wiring on the bf16 kernel path."""
    from lbmdem_tpu.simulation import make_step_fn

    cfg = SimConfig(nx=256, ny=32, tau=0.7, dtype="float32", max_disks=1,
                    window=13, f_storage="bfloat16", bc_west="inlet",
                    bc_east="outlet", u_inlet=0.05,
                    inlet_profile="poiseuille", n_sub=2)
    disks = [DiskSpec(48.0, 16.0, 4.0, vx=0.02)]
    ref = Simulation(cfg, disks)
    pal = Simulation(cfg, disks, use_pallas=True)
    assert ref.state.f.dtype == jnp.bfloat16
    step_r = jax.jit(make_step_fn(ref.cfg, ref.grid, False))
    step_p = jax.jit(make_step_fn(pal.cfg, pal.grid, True))
    sr, sp = ref.state, pal.state
    for _ in range(3):
        sr = step_r(sr)
        sp = step_p(sp)
    np.testing.assert_allclose(np.asarray(sr.f, np.float32),
                               np.asarray(sp.f, np.float32), atol=3e-4)
    np.testing.assert_allclose(np.asarray(sr.disks.x), np.asarray(sp.disks.x),
                               rtol=1e-5, atol=1e-6)


def test_channel_inflow_outflow_poiseuille():
    """Parabolic inlet + y walls at steady state: the profile SHAPE
    stays parabolic everywhere (the amplitude grows ~Ma^2 downstream as
    rho drops - real compressible channel physics, u ~ flux/rho), the
    column mass flux rho*u is constant along the interior, and the
    outlet density is pinned. The Zou/He pressure outlet carries a
    known even-odd artifact confined to the last few columns - bounded
    here, excluded from the interior-constancy check."""
    ny, nx = 24, 96
    umax = 0.05
    cfg = SimConfig(nx=nx, ny=ny, tau=0.8, dtype="float64",
                    bc_west="inlet", bc_east="outlet", u_inlet=umax,
                    inlet_profile="poiseuille")
    sim = Simulation(cfg)
    sim.run(12000)
    rho, ux, _ = sim.macroscopic()
    y = np.arange(ny) + 0.5
    parab = 4.0 * umax / ny**2 * y * (ny - y)
    # inlet column carries the exact prescribed profile
    np.testing.assert_allclose(ux[:, 0], parab, rtol=0, atol=1e-12)
    # normalized profile shape stays parabolic along the channel
    pshape = parab / parab.max()
    for xq in (nx // 4, nx // 2, 3 * nx // 4):
        shape = ux[:, xq] / ux[:, xq].max()
        np.testing.assert_allclose(shape, pshape, atol=2e-3)
    # column mass flux constant along the interior (steady continuity)
    flux = (rho * ux).sum(axis=0)
    interior = flux[2 : nx - 8]
    np.testing.assert_allclose(interior, interior[0], rtol=3e-3)
    # the outlet boundary-layer artifact stays small and local
    np.testing.assert_allclose(flux, interior[0], rtol=0.02)
    # outlet density pinned at rho0
    np.testing.assert_allclose(rho[:, -1].mean(), 1.0, atol=1e-6)


_PARITY_CFGS = [
    ("poiseuille", {}),
    pytest.param("uniform", dict(collision="trt"), marks=pytest.mark.slow),
    pytest.param("uniform", dict(bc_south="periodic", bc_north="periodic"),
                 marks=pytest.mark.slow),
]


@pytest.mark.parametrize("prof,extra", _PARITY_CFGS)
def test_openbc_kernel_parity(_interpret, prof, extra):
    """Fused kernel Zou/He fixup vs the oracle, random state."""
    cfg = SimConfig(nx=128, ny=16, tau=0.8, dtype="float32",
                    bc_west="inlet", bc_east="outlet", u_inlet=0.05,
                    inlet_profile=prof, **extra)
    rng = np.random.default_rng(3)
    base = lattice.W[:, None, None].astype(np.float32)
    f = jnp.asarray(
        base * (1.0 + 0.02 * rng.standard_normal((9, 16, 128))
                .astype(np.float32))
    )
    ref, got = f, f
    for _ in range(2):
        ref = lbm.step_pure_fluid(ref, cfg)
        got = pallas_lbm.fused_step_fluid(got, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)


def test_openbc_coupled_kernel_parity(_interpret):
    """Coupled kernel with a fixed obstacle + open boundaries."""
    cfg = SimConfig(nx=128, ny=32, tau=0.7, dtype="float32", max_disks=1,
                    window=13, bc_west="inlet", bc_east="outlet",
                    u_inlet=0.05, inlet_profile="poiseuille")
    rng = np.random.default_rng(5)
    base = lattice.W[:, None, None].astype(np.float32)
    f = jnp.asarray(
        base * (1.0 + 0.02 * rng.standard_normal((9, 32, 128))
                .astype(np.float32))
    )
    xp = jnp.asarray([[48.0, 16.0]], jnp.float32)
    vp = jnp.zeros((1, 2), jnp.float32)
    om = jnp.zeros((1,), jnp.float32)
    rr = jnp.asarray([5.0], jnp.float32)
    act = jnp.asarray([True])
    eps, usx, usy = imb.stamp_solid_fraction(xp, vp, om, rr, act, cfg)
    fpost, _, _ = imb.collide_imb(f, eps, usx, usy, cfg)
    fref = lbm.apply_open_boundaries(
        lbm.apply_bounce_back(lbm.stream(fpost), fpost, cfg), cfg
    )
    fgot, _, _ = pallas_lbm.fused_step_imb(f, eps, usx, usy, cfg)
    np.testing.assert_allclose(np.asarray(fgot), np.asarray(fref),
                               rtol=1e-6, atol=1e-7)


def test_cull_open_boundaries_unit():
    """dem.cull_open_boundaries: straddling disks stay active, fully-out
    mobile disks deactivate and park, fixed disks are exempt."""
    from lbmdem_tpu.ops import dem

    cfg = SimConfig(nx=64, ny=32, bc_west="inlet", bc_east="outlet",
                    u_inlet=0.05, max_disks=4, dtype="float64")
    specs = [
        DiskSpec(65.0, 16.0, 3.0),              # straddles outlet: stays
        DiskSpec(67.0, 16.0, 3.0, vx=0.1),      # fully out east: culled
        DiskSpec(-4.0, 16.0, 3.0),              # fully out west: culled
        DiskSpec(68.0, 16.0, 3.0, fixed=True),  # fixed: exempt
    ]
    d = dem.make_disk_state(specs, cfg)
    out = dem.cull_open_boundaries(d, cfg)
    np.testing.assert_array_equal(
        np.asarray(out.active), [True, False, False, True]
    )
    assert float(out.x[1, 0]) == -1.0e6 and float(out.v[1, 0]) == 0.0
    # untouched disks keep their state
    assert float(out.x[0, 0]) == 65.0
    assert float(out.x[3, 0]) == 68.0


def test_mobile_disk_advects_out_and_culls():
    """End-to-end: a neutrally-buoyant mobile disk carried by the inflow
    exits through the outlet and is deactivated; the simulation stays
    finite and a fixed obstacle disk survives."""
    cfg = SimConfig(nx=96, ny=24, tau=0.7, dtype="float64", max_disks=2,
                    bc_west="inlet", bc_east="outlet", u_inlet=0.1,
                    inlet_profile="uniform", rho_s=1.0, n_sub=2,
                    u0x=0.1)
    disks = [
        DiskSpec(70.0, 12.0, 3.0, vx=0.1),
        DiskSpec(20.0, 6.0, 2.5, fixed=True),
    ]
    sim = Simulation(cfg, disks)
    assert bool(sim.state.disks.active[0])
    sim.run(600)
    d = sim.state.disks
    assert not bool(d.active[0]), (
        f"disk should have exited (x={float(d.x[0, 0])})"
    )
    assert bool(d.active[1])  # fixed obstacle untouched
    assert float(d.x[0, 0]) == -1.0e6  # parked
    assert np.isfinite(np.asarray(sim.state.f)).all()
    rho, ux, _ = sim.macroscopic()
    assert (rho > 0).all() and np.isfinite(ux).all()


@pytest.mark.slow  # physics covered quicker by bookkeeping/parity tests
def test_cylinder_in_channel_drag():
    """Fixed cylinder in an inflow/outflow channel develops a positive
    drag and a finite recirculation; flux still balances around it."""
    cfg = SimConfig(nx=128, ny=48, tau=0.65, dtype="float64", max_disks=1,
                    bc_west="inlet", bc_east="outlet", u_inlet=0.08,
                    inlet_profile="poiseuille")
    sim = Simulation(cfg, [DiskSpec(32.0, 24.0, 6.0, fixed=True)])
    sim.run(3000)
    F, T = sim.hydro_forces()
    assert F[0, 0] > 0.0
    rho, ux, _ = sim.macroscopic()
    assert np.isfinite(ux).all()
    # wake: centerline velocity right behind the cylinder is depressed
    # vs the free channel ahead of it
    assert ux[24, 44] < 0.5 * ux[24, 8]
    # flow recovers downstream of the wake
    assert ux[24, 100] > ux[24, 44]


def test_strouhal_estimator_synthetic():
    """The 2D-2 Strouhal estimator (tools/benchmark_cylinder.py) on a
    synthetic lift signal of known period: recovered St must match the
    analytic D/(T u_mean) despite a DC offset, amplitude drift, and a
    coarse sample interval (the endpoint-averaging bound)."""
    from tools.benchmark_cylinder import measure_strouhal

    D, u_mean, period = 20.0, 0.05, 1333.0  # ~the scale-1 2D-2 numbers
    steps = np.arange(0, 50_000, 125)  # coarse sampling, ~10.7/period
    cl = 1.0 + (1.0 + 1e-5 * steps) * np.sin(2 * np.pi * steps / period)
    cd = 3.0 + 0.1 * np.sin(4 * np.pi * steps / period)  # 2x frequency
    hist = np.stack([steps, cd, cl], axis=1)
    res = measure_strouhal(hist, D, u_mean)
    assert res is not None
    st, n_per, cd_max, cl_max = res
    assert abs(st - D / (period * u_mean)) / (D / (period * u_mean)) < 0.01
    assert n_per >= 10
    assert cd_max == pytest.approx(3.1, abs=0.01)
    assert cl_max > 1.9  # offset + grown amplitude

    # too-short history: not yet periodic -> None, never a crash
    assert measure_strouhal(hist[:8], D, u_mean) is None
