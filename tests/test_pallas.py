"""Fused Pallas kernel vs the plain-JAX oracle (interpret mode on CPU;
the same kernels compile for real on TPU - exercised by bench/run)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbmdem_tpu import lattice
from lbmdem_tpu.config import SimConfig
from lbmdem_tpu.ops import imb, lbm, pallas_lbm


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pallas_lbm, "_INTERPRET", True)


def _rand_f(ny, nx, seed=0):
    rng = np.random.default_rng(seed)
    base = lattice.W[:, None, None].astype(np.float32)
    pert = 1.0 + 0.05 * rng.standard_normal((9, ny, nx)).astype(np.float32)
    return jnp.asarray(base * pert)


# Quick-lane representatives cover every kernel FEATURE (periodic/wall
# BCs, forcing, LES, moving walls, TRT, TRT+LES); the slow-marked rows
# are compositions of already-covered features (r5 lane trim - the
# full matrix still runs under -m slow).
_sp = pytest.mark.slow
CFGS = [
    dict(),  # periodic x, walls y
    dict(bc_west="wall", bc_east="wall"),
    dict(bc_south="periodic", bc_north="periodic"),
    dict(gx=1e-5, gy=-2e-5),
    pytest.param(dict(bc_west="wall", bc_east="wall", gy=-1e-5),
                 marks=_sp),  # walls x forcing: both covered above
    dict(smagorinsky=0.16, gx=2e-5),  # LES path
    # moving walls (C6): lid-driven cavity + mixed moving sides
    dict(bc_west="wall", bc_east="wall", uw_north=0.08),
    pytest.param(dict(bc_west="wall", bc_east="wall", uw_west=0.05,
                      uw_south=-0.02, uw_east=-0.03, uw_north=0.04),
                 marks=_sp),  # 4-sided: uw term covered by uw_north
    # TRT collision (even/odd split in the pair-form kernel algebra)
    dict(collision="trt"),
    pytest.param(dict(collision="trt", bc_west="wall", bc_east="wall",
                      gx=2e-5), marks=_sp),  # trt x walls x forcing
    dict(collision="trt", smagorinsky=0.16, gx=1e-5),  # TRT + LES
]


@pytest.mark.parametrize("overrides", CFGS)
def test_fused_fluid_matches_oracle(overrides):
    cfg = SimConfig(nx=128, ny=16, tau=0.8, dtype="float32", **overrides)
    f = _rand_f(cfg.ny, cfg.nx)
    ref = f
    got = f
    for _ in range(2):
        ref = lbm.step_pure_fluid(ref, cfg)
        got = pallas_lbm.fused_step_fluid(got, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-7)


def test_fused_fluid_multi_strip():
    """ny > strip height: exercises halo DMA across strip boundaries."""
    cfg = SimConfig(nx=128, ny=96, tau=0.7, gx=1e-5, dtype="float32")
    f = _rand_f(cfg.ny, cfg.nx, seed=3)
    ref = lbm.step_pure_fluid(f, cfg)
    got = pallas_lbm.fused_step_fluid(f, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-7)


def test_fluid_tile_flavor():
    """The pure-fluid f32 path prefers 256-row tiles (the one clean
    th=256 winner on hardware, +4.2%); every other chooser keeps 128,
    and bf16 storage keeps 128 on the fluid path too (measured loss).
    Parity at the 256-row tile exercises the branch the small default
    grids never reach."""
    cfg = SimConfig(nx=128, ny=256, tau=0.7, gy=-1e-5, dtype="float32",
                    bc_west="wall", bc_east="wall")
    assert pallas_lbm.tile_dims(cfg, wide=True, fluid=True)[0] == 256
    assert pallas_lbm.tile_dims(cfg, wide=True)[0] == 128
    assert pallas_lbm.tile_dims(
        cfg.replace(f_storage="bfloat16"), wide=True, fluid=True)[0] == 128
    f = _rand_f(cfg.ny, cfg.nx, seed=5)
    ref = lbm.step_pure_fluid(f, cfg)
    got = pallas_lbm.fused_step_fluid(f, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("overrides", CFGS)
def test_fluid_temporal_block_matches_oracle(overrides):
    """k-step temporal blocking (fused_step_fluid_multi) vs k oracle
    steps, across all BC/forcing/LES/moving-wall configs - validity of
    the halo-margin dependency-cone argument is BC-dependent (wrapped
    halos must evolve exactly on periodic axes, BB anchors walls)."""
    cfg = SimConfig(nx=128, ny=16, tau=0.8, dtype="float32", **overrides)
    f = _rand_f(cfg.ny, cfg.nx, seed=7)
    ref = f
    for _ in range(8):
        ref = lbm.step_pure_fluid(ref, cfg)
    got = pallas_lbm.fused_step_fluid_multi(f, cfg, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=5e-7)


@pytest.mark.parametrize("k", [pytest.param(2, marks=pytest.mark.slow), 5])
def test_fluid_temporal_block_odd_k_multi_tile(k):
    """Non-maximal k on a multi-tile grid (iy/ix wall conditions +
    cross-tile halo wraps inside the blocked window)."""
    cfg = SimConfig(nx=256, ny=64, tau=0.7, gy=-1e-5, uw_north=0.05,
                    dtype="float32")
    f = _rand_f(cfg.ny, cfg.nx, seed=9)
    ref = f
    for _ in range(k):
        ref = lbm.step_pure_fluid(ref, cfg)
    got = pallas_lbm.fused_step_fluid_multi(f, cfg, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=5e-7)


@pytest.mark.parametrize("ybc", [
    pytest.param("wall", marks=pytest.mark.slow),  # r5 lane trim: the
    # periodic-y variant composes two halo mechanisms and stays quick
    "periodic"])
def test_fluid_temporal_block_openbc(ybc):
    """Zou/He inlet/outlet under temporal blocking: the closure is
    reconstructed on the boundary columns per inner step inside the
    window (same-cell knowns anchor the validity cone like wall BB).
    periodic-y additionally exercises the wrapped global-row profile on
    the window's halo rows (they hold true wrapped data there)."""
    kw = dict(bc_south="wall", bc_north="wall") if ybc == "wall" else dict(
        bc_south="periodic", bc_north="periodic")
    cfg = SimConfig(nx=256, ny=64, tau=0.7, dtype="float32",
                    bc_west="inlet", bc_east="outlet", u_inlet=0.06,
                    inlet_profile="poiseuille", **kw)
    f = _rand_f(cfg.ny, cfg.nx, seed=11)
    ref = f
    for _ in range(8):
        ref = lbm.step_pure_fluid(ref, cfg)
    got = pallas_lbm.fused_step_fluid_multi(f, cfg, 8)
    # in-kernel traced-f32 profile vs the oracle's host-f64 array:
    # ~1 f32 ulp per inlet row per step (same as the k=1 kernel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=2e-6)


def test_simulation_temporal_chunks_openbc():
    """The chunk driver takes the temporal-block path for single-chip
    open-bc decks now (the gate was mesh-only-ified); mixed macros +
    remainder must match the oracle driver."""
    from lbmdem_tpu.simulation import Simulation, TEMPORAL_K

    cfg = SimConfig(nx=256, ny=64, tau=0.7, dtype="float32",
                    bc_west="inlet", bc_east="outlet", u_inlet=0.05,
                    out_interval=11)
    s1 = Simulation(cfg)
    s2 = Simulation(cfg, use_pallas=True)
    s1.run(11)
    s2.run(11)
    assert int(s2.state.step) == 11
    np.testing.assert_allclose(np.asarray(s1.state.f),
                               np.asarray(s2.state.f), rtol=1e-5, atol=2e-6)


@pytest.mark.parametrize("openbc", [
    pytest.param(False, marks=pytest.mark.slow),  # walls+gx variant is
    True,  # covered by the (slow) e2e hoist tests; keep Zou/He quick
])
def test_static_imb_temporal_block_matches_oracle(openbc):
    """fused_step_imb_static_multi: k coupled steps per pass over a
    STATIC solid stack (the static-solid hoist's chunk kernel). The
    solid window never decays, so the pure-fluid temporal validity
    argument carries over; parity vs k oracle coupled steps."""
    from lbmdem_tpu.ops import imb

    kw = (dict(bc_west="inlet", bc_east="outlet", u_inlet=0.05)
          if openbc else dict(bc_west="wall", bc_east="wall", gx=1e-5))
    cfg = SimConfig(nx=256, ny=64, tau=0.7, dtype="float32", max_disks=2,
                    window=9, **kw)
    rng = np.random.default_rng(13)
    # static obstacles straddling tile boundaries
    xs = jnp.asarray([[64.3, 32.1], [128.0, 40.0]], jnp.float32)
    vs = jnp.zeros((2, 2), jnp.float32)
    om = jnp.zeros((2,), jnp.float32)
    r = jnp.asarray([4.0, 3.0], jnp.float32)
    act = jnp.ones((2,), bool)
    eps, usx, usy = imb.stamp_solid_fraction(xs, vs, om, r, act, cfg)
    if openbc:
        eps, usx, usy = imb.mask_open_columns(eps, usx, usy)
    f = _rand_f(cfg.ny, cfg.nx, seed=21)
    ref = f
    for _ in range(8):
        fpost, _, _ = imb.collide_imb(ref, eps, usx, usy, cfg)
        ref = lbm.apply_open_boundaries(
            lbm.apply_bounce_back(lbm.stream(fpost), fpost, cfg), cfg
        )
    solid = jnp.stack([eps, usx, usy])
    got = pallas_lbm.fused_step_imb_static_multi(f, solid, cfg, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=2e-6)


@pytest.mark.slow  # the openbc variant below drives the same chunk
# machinery (temporal blocks + remainder) plus Zou/He - it is the
# quick-lane representative (r5 lane trim)
def test_simulation_temporal_chunks_match_oracle():
    """Simulation chunk driver mixing TEMPORAL_K-step macros + a
    single-step remainder (19 = 4x4 + 3 at the production k=4) vs the
    plain-JAX oracle driver."""
    from lbmdem_tpu.simulation import Simulation

    cfg = SimConfig(nx=128, ny=16, tau=0.8, gx=1e-5, uw_north=0.03,
                    dtype="float32", out_interval=19)
    s_ref = Simulation(cfg)
    s_pal = Simulation(cfg, use_pallas=True)
    s_ref.run(19)
    s_pal.run(19)
    assert int(s_pal.state.step) == 19
    np.testing.assert_allclose(np.asarray(s_pal.state.f),
                               np.asarray(s_ref.state.f),
                               rtol=1e-5, atol=5e-7)


def _bf16_oracle_step(fs, cfg):
    """bf16-storage oracle: dequantize -> f32 oracle step -> requantize
    (exactly the kernel's structure: one rounding per stored step)."""
    return lbm.to_storage(
        lbm.step_pure_fluid(lbm.from_storage(fs, cfg), cfg), cfg
    )


@pytest.mark.parametrize("overrides", [
    dict(gx=1e-5),
    pytest.param(dict(bc_west="wall", bc_east="wall", uw_north=0.05,
                      gy=-1e-5), marks=pytest.mark.slow),  # lane budget:
    # the wall/moving-wall machinery has its own quick f32 coverage
    pytest.param(dict(collision="trt", gx=1e-5),  # shift under TRT split
                 marks=pytest.mark.slow),
])
def test_fused_fluid_bf16_matches_emulated_oracle(overrides):
    """Shifted-bf16 storage (f_storage='bfloat16'): kernel vs the
    quantized oracle. f32 summation order differs between the two, so a
    value sitting on a bf16 rounding boundary can flip one ulp -
    tolerance is ~1 ulp of the residual scale (|g| <~ 0.03)."""
    cfg = SimConfig(nx=128, ny=16, tau=0.8, dtype="float32",
                    f_storage="bfloat16", **overrides)
    fs = lbm.to_storage(_rand_f(cfg.ny, cfg.nx, seed=2).astype(jnp.float32),
                        cfg)
    assert fs.dtype == jnp.bfloat16
    ref = fs
    got = fs
    for _ in range(2):
        ref = _bf16_oracle_step(ref, cfg)
        got = pallas_lbm.fused_step_fluid(got, cfg)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=3e-4)


def test_fused_fluid_bf16_rest_state_exact():
    """The shifted storage's design invariant: equilibrium at rest is
    g = feq - w*rho0 = 0 EXACTLY in bf16, and stays exactly 0 through
    the kernel (no forcing)."""
    cfg = SimConfig(nx=128, ny=16, tau=0.8, dtype="float32",
                    f_storage="bfloat16")
    fs = lbm.to_storage(lbm.init_equilibrium(cfg), cfg)
    np.testing.assert_array_equal(np.asarray(fs, np.float32), 0.0)
    out = pallas_lbm.fused_step_fluid(fs, cfg)
    np.testing.assert_array_equal(np.asarray(out, np.float32), 0.0)


def test_fluid_temporal_block_bf16():
    """Temporal blocking on bf16 storage: 16-row halo granule allows
    k up to 16; inner steps stay f32 (one rounding at writeback), so
    the oracle emulation is k f32 steps between quantizations."""
    cfg = SimConfig(nx=128, ny=32, tau=0.8, gy=-1e-5, uw_north=0.03,
                    dtype="float32", f_storage="bfloat16")
    f0 = _rand_f(cfg.ny, cfg.nx, seed=4).astype(jnp.float32)
    fs = lbm.to_storage(f0, cfg)
    ref = lbm.from_storage(fs, cfg)
    for _ in range(10):
        ref = lbm.step_pure_fluid(ref, cfg)
    ref = lbm.to_storage(ref, cfg)
    got = pallas_lbm.fused_step_fluid_multi(fs, cfg, 10)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=3e-4)


@pytest.mark.slow  # interpret-mode stamp/reduce loops run per-slot
def test_coupled_bf16_matches_oracle_emulation():
    """Full coupled step with bf16 f-storage: Simulation(use_pallas)
    vs the oracle path (which emulates the same per-step storage
    quantization). Disk forces are f32 off the same quantized f, so
    trajectories track within rounding noise over a few steps."""
    from lbmdem_tpu.config import DiskSpec
    from lbmdem_tpu.simulation import Simulation, make_step_fn

    cfg = SimConfig(nx=256, ny=128, tau=0.8, dtype="float32", g_py=-1e-4,
                    rho_s=2.0, kn=0.5, gamma_n=0.5, n_sub=5, tile_cap=64,
                    f_storage="bfloat16",
                    bc_west="wall", bc_east="wall")
    disks = [DiskSpec(64.3, 96.2, 4.0), DiskSpec(130.0, 64.0, 3.0, vx=0.01)]
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
    np.testing.assert_allclose(np.asarray(sr.disks.v), np.asarray(sp.disks.v),
                               rtol=1e-4, atol=1e-6)


def _window_scene(**overrides):
    from lbmdem_tpu.config import DiskSpec
    from lbmdem_tpu.simulation import Simulation

    # minimal: the dominant cost is the interpret-mode build of the
    # fused window kernel itself (~50 s), not the scene
    kw = dict(nx=128, ny=32, tau=0.8, dtype="float32", g_py=-1e-4,
              buoyancy=True, rho_s=2.0, kn=0.5, gamma_n=0.5, n_sub=2,
              bc_west="wall", bc_east="wall")
    kw.update(overrides)
    cfg = SimConfig(**kw)
    disks = [DiskSpec(40.0, 16.0, 3.0), DiskSpec(100.2, 20.1, 2.5, vx=0.01),
             DiskSpec(70.0, 24.0, 2.0, omega=0.004)]
    return Simulation(cfg, disks, use_pallas=True)


def test_coupled_window_matches_windowed_oracle():
    """coupling_k temporal blocking: the fused k-step window kernel
    (fused_step_imb_reduce_multi - frozen window-start solid fields,
    per-inner-step force reduce feeding k DEM applications) vs the
    plain-JAX windowed oracle (make_step_fn(use_pallas=False,
    coupling_k=k)) running the SAME frozen-field algorithm - parity is
    tight because the physics approximation is identical on both
    sides; the approximation itself is measured against per-step
    coupling in test_coupling_k_settling_delta."""
    from lbmdem_tpu.simulation import make_step_fn

    sim = _window_scene()
    k = 2  # k=4 runs in the slow chunk/variant tests (interpret cost ~ k)
    sk = jax.jit(make_step_fn(sim.cfg, sim.grid, True,
                              dem_axis=sim.dem_axis, dem_mode=sim.dem_mode,
                              coupling_k=k))(sim.state)
    so = jax.jit(make_step_fn(sim.cfg, sim.grid, False,
                              dem_axis=sim.dem_axis, dem_mode=sim.dem_mode,
                              coupling_k=k))(sim.state)
    assert int(sk.step) == k and int(so.step) == k
    assert int(sk.overflow) == 0
    np.testing.assert_allclose(np.asarray(sk.f), np.asarray(so.f),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sk.disks.x),
                               np.asarray(so.disks.x), rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sk.disks.v),
                               np.asarray(so.disks.v), rtol=1e-5, atol=1e-7)


@pytest.mark.slow  # interpret-mode fused coupled window variants
@pytest.mark.parametrize("overrides", [
    dict(f_storage="bfloat16"),                      # storage converts at window ends
    dict(bc_west="inlet", bc_east="outlet", u_inlet=0.05,
         inlet_profile="poiseuille"),                # Zou/He per inner step
    dict(bc_west="periodic", bc_east="periodic"),    # ghosts frozen per window
    dict(collision="trt"),
])
def test_coupled_window_variants_match_windowed_oracle(overrides):
    from lbmdem_tpu.simulation import make_step_fn

    sim = _window_scene(**overrides)
    k = 2
    sk = jax.jit(make_step_fn(sim.cfg, sim.grid, True,
                              dem_axis=sim.dem_axis, dem_mode=sim.dem_mode,
                              coupling_k=k))(sim.state)
    so = jax.jit(make_step_fn(sim.cfg, sim.grid, False,
                              dem_axis=sim.dem_axis, dem_mode=sim.dem_mode,
                              coupling_k=k))(sim.state)
    bf16 = overrides.get("f_storage") == "bfloat16"
    np.testing.assert_allclose(np.asarray(sk.f, np.float32),
                               np.asarray(so.f, np.float32),
                               rtol=1e-6, atol=3e-4 if bf16 else 1e-6)
    np.testing.assert_allclose(np.asarray(sk.disks.x),
                               np.asarray(so.disks.x), rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sk.disks.v),
                               np.asarray(so.disks.v), rtol=1e-4, atol=1e-6)


@pytest.mark.slow  # ~2 interpret-mode chunk builds
def test_coupling_k_simulation_chunk():
    """Simulation(coupling_k=8) drives whole cadence blocks through the
    window kernel (one k=8 window per rebuild - the bf16+ramp
    production tier's k) plus a per-step remainder; trajectories stay
    physically close to per-step coupling (the geometry lag is
    < k * |v| cells) and the step count is exact. k=2 has the quick
    parity test, k=4 the sharded ones."""
    from lbmdem_tpu.config import DiskSpec
    from lbmdem_tpu.simulation import Simulation

    kw = dict(nx=128, ny=64, tau=0.8, dtype="float32", g_py=-1e-4,
              buoyancy=True, rho_s=2.0, kn=0.5, gamma_n=0.5, n_sub=5,
              bc_west="wall", bc_east="wall")
    disks = [DiskSpec(40.0, 40.0, 3.0), DiskSpec(100.0, 50.0, 2.0)]
    n = 19  # 2 cadence blocks + 3 remainder steps
    simw = Simulation(SimConfig(**kw, coupling_k=8), disks, use_pallas=True)
    simw.state = simw._chunk_fn(n)(simw.state)
    simp = Simulation(SimConfig(**kw), disks, use_pallas=True)
    simp.state = simp._chunk_fn(n)(simp.state)
    assert int(simw.state.step) == n
    assert int(simw.state.overflow) == 0
    np.testing.assert_allclose(np.asarray(simw.state.disks.x),
                               np.asarray(simp.state.disks.x),
                               rtol=0, atol=0.05)
    assert bool(jnp.all(jnp.isfinite(simw.state.f)))


def test_coupling_k_validation():
    from lbmdem_tpu.config import DiskSpec
    from lbmdem_tpu.simulation import Simulation

    with pytest.raises(ValueError, match="coupling_k"):
        SimConfig(nx=64, ny=32, coupling_k=3)  # not a divisor of 8
    with pytest.raises(ValueError, match="coupling_k"):
        SimConfig(nx=64, ny=32, coupling_k=16)  # beyond the solid halo
    cfg = SimConfig(nx=128, ny=64, tau=0.8, coupling_k=4, rho_s=2.0,
                    bc_west="wall", bc_east="wall")
    with pytest.raises(ValueError, match="use_pallas"):
        Simulation(cfg, [DiskSpec(40.0, 40.0, 3.0)])
    with pytest.raises(ValueError, match="paranoia"):
        Simulation(cfg.replace(paranoia="step"), [DiskSpec(40.0, 40.0, 3.0)],
                   use_pallas=True)


def test_fused_imb_matches_oracle():
    cfg = SimConfig(nx=128, ny=32, tau=0.8, dtype="float32", max_disks=1,
                    window=13, bc_west="wall", bc_east="wall", gy=-1e-5)
    f = _rand_f(cfg.ny, cfg.nx, seed=5)
    xp = jnp.asarray([[64.0, 16.0]], jnp.float32)
    vp = jnp.asarray([[0.01, -0.02]], jnp.float32)
    om = jnp.asarray([0.005], jnp.float32)
    rr = jnp.asarray([4.0], jnp.float32)
    act = jnp.asarray([True])
    eps, usx, usy = imb.stamp_solid_fraction(xp, vp, om, rr, act, cfg)

    fpost, phix_r, phiy_r = imb.collide_imb(f, eps, usx, usy, cfg)
    fref = lbm.apply_bounce_back(lbm.stream(fpost), fpost, cfg)

    fgot, phix, phiy = pallas_lbm.fused_step_imb(f, eps, usx, usy, cfg)
    np.testing.assert_allclose(np.asarray(fgot), np.asarray(fref), rtol=1e-6, atol=1e-7)
    # atol floor 5e-8: the kernel's pair-form moments sum rho in a
    # different order than the oracle, an f32-ulp effect that scales
    # the tiny near-zero phi values
    np.testing.assert_allclose(np.asarray(phix), np.asarray(phix_r), rtol=1e-5, atol=5e-8)
    np.testing.assert_allclose(np.asarray(phiy), np.asarray(phiy_r), rtol=1e-5, atol=5e-8)


def test_fused_imb_lambda_mode_matches_oracle():
    """nt_mode='lambda' (TRT/Lambda-consistent B weighting, VERDICT r4
    #7): kernel vs oracle parity, and the weighting must actually
    change the result vs the default NT blend (non-vacuous flag)."""
    kw = dict(nx=128, ny=32, tau=0.8, dtype="float32", max_disks=1,
              window=13, bc_west="wall", bc_east="wall", gy=-1e-5)
    cfg = SimConfig(**kw, nt_mode="lambda")
    f = _rand_f(cfg.ny, cfg.nx, seed=5)
    xp = jnp.asarray([[64.0, 16.0]], jnp.float32)
    vp = jnp.asarray([[0.01, -0.02]], jnp.float32)
    om = jnp.asarray([0.005], jnp.float32)
    rr = jnp.asarray([4.0], jnp.float32)
    act = jnp.asarray([True])
    eps, usx, usy = imb.stamp_solid_fraction(xp, vp, om, rr, act, cfg)

    fpost, phix_r, phiy_r = imb.collide_imb(f, eps, usx, usy, cfg)
    fref = lbm.apply_bounce_back(lbm.stream(fpost), fpost, cfg)

    fgot, phix, phiy = pallas_lbm.fused_step_imb(f, eps, usx, usy, cfg)
    np.testing.assert_allclose(np.asarray(fgot), np.asarray(fref),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(phix), np.asarray(phix_r),
                               rtol=1e-5, atol=5e-8)
    np.testing.assert_allclose(np.asarray(phiy), np.asarray(phiy_r),
                               rtol=1e-5, atol=5e-8)
    # at tau=0.8, tm 0.3 -> 0.625: B in the shell differs materially
    _, phix_nt, _ = imb.collide_imb(f, eps, usx, usy, SimConfig(**kw))
    assert not np.allclose(np.asarray(phix_r), np.asarray(phix_nt),
                           rtol=0, atol=1e-9)


def test_fused_imb_trt_matches_oracle():
    """Coupled kernel under TRT: the (1-B)-blended even/odd relaxation
    plus the unchanged NT solid term must match the oracle."""
    cfg = SimConfig(nx=128, ny=32, tau=0.9, dtype="float32", max_disks=1,
                    window=13, collision="trt", gy=-1e-5)
    f = _rand_f(cfg.ny, cfg.nx, seed=11)
    xp = jnp.asarray([[40.0, 16.0]], jnp.float32)
    vp = jnp.asarray([[-0.01, 0.02]], jnp.float32)
    om = jnp.asarray([-0.004], jnp.float32)
    rr = jnp.asarray([4.0], jnp.float32)
    act = jnp.asarray([True])
    eps, usx, usy = imb.stamp_solid_fraction(xp, vp, om, rr, act, cfg)

    fpost, phix_r, phiy_r = imb.collide_imb(f, eps, usx, usy, cfg)
    fref = lbm.apply_bounce_back(lbm.stream(fpost), fpost, cfg)

    fgot, phix, phiy = pallas_lbm.fused_step_imb(f, eps, usx, usy, cfg)
    np.testing.assert_allclose(np.asarray(fgot), np.asarray(fref),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(phix), np.asarray(phix_r),
                               rtol=1e-5, atol=5e-8)
    np.testing.assert_allclose(np.asarray(phiy), np.asarray(phiy_r),
                               rtol=1e-5, atol=5e-8)
