"""Fused Pallas TPU kernels for the LBM hot loop (SURVEY.md SS7 stage 5).

One kernel pass per step fuses: macroscopic moments -> (NT-blended) BGK
collision (+ Guo forcing) -> pull streaming -> half-way bounce-back,
and for the coupled path also emits the per-cell momentum-exchange
field. This replaces the collide/stream kernel pair of the reference's
CUDA design (SURVEY SS3.2) with a single sweep: f is read once from HBM
(plus a halo margin) and written once.

Design notes (Mosaic/TPU constraints shape everything):
- BlockSpecs cannot express overlapping windows, and DMA slices of
  *tiled* VMEM buffers must be whole (8, 128) tiles - a 1-row halo copy
  does not compile. So each (TH, TW) tile manually DMAs a halo-extended
  window of (TH+16, TW+256): 3x3 aligned chunks (8-row / 128-column
  blocks) with wrap-safe offsets. The single-row/column halos actually
  consumed are unaligned *value* slices of that window - relayouts are
  legal on values, only memref slices must be tile-aligned.
- Streaming x-shifts are lane rolls on the wide window; the final
  column slice [128 : 128+TW] is lane-aligned, hence relayout-free.
- Halo wrap = periodic BC; on wall sides the wrapped values are only
  pulled into populations that bounce-back overwrites (same invariant
  as the jnp.roll oracle).
- Collision is recomputed on the 2-cell overlap; the 8/128-granular
  halo reads cost (1+16/TH)(1+256/TW) extra read bandwidth - TH=64,
  TW=1024 => 1.56x read, 1x write, still well under the separate-pass
  oracle's traffic.

The plain-JAX ops in lbm.py/imb.py are the oracle; parity is enforced
by tests/test_pallas.py (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lbmdem_tpu import lattice
from lbmdem_tpu.config import SimConfig, WALL

def _interpret() -> bool:
    """Compiled on TPU; interpreter elsewhere (CPU tests, debugging)."""
    return _INTERPRET or jax.default_backend() != "tpu"


_INTERPRET = False  # force-interpret override

_HY = 8  # halo chunk rows (sublane granularity)
_HX = 128  # halo chunk cols (lane granularity)

# per-disk chains interleaved per loop iteration in the fused reduce
# (see the _FUSED_REDUCE_ILP comment at the reduce_partials_banded call).
# Banded A/B at 4096^2/10k: ilp 8 = 8.82 ms vs ilp 4 = 9.14 ms (the
# full-tile loops had measured ilp 8 NEGATIVE - banding halved the vreg
# pressure and flipped the tradeoff). LBMDEM_RILP env overrides at
# trace time for hardware A/Bs (re-check at the coupling_k windows,
# where the reduce body inlines k*sub times and shares vregs with k
# unrolled collide/stream steps).
_FUSED_REDUCE_ILP = 8


def _reduce_ilp() -> int:
    import os

    v = os.environ.get("LBMDEM_RILP")
    return int(v) if v else _FUSED_REDUCE_ILP


def _storage(cfg: SimConfig):
    """(dtype, row granule, feq shift) of the f HBM storage.

    bf16 VMEM tiles are (16, 128), so the halo DMA row granule doubles
    (lane granule stays 128); the shift realizes lbm.storage_shift
    in-kernel (geq = feq - w_i*shift)."""
    if cfg.f_storage == "bfloat16":
        return jnp.bfloat16, 16, float(cfg.rho0)
    return jnp.float32, _HY, 0.0


def coupled_tile_rows(coupling_k: int) -> Tuple[int, ...]:
    """Row-candidate chain of the COUPLED kernel flavor - the SINGLE
    source for every chooser that must stay in lockstep with it
    (tile_dims below, pallas_stamp.tile_dims, and
    parallel/_pallas_step.canvas_pads; the fused kernel's trace-time
    "stamp rows == lattice tile rows" assert is the backstop, this is
    the fix-in-one-place). th=256 wins at EVERY coupling_k since r5:
    +2.3-2.4% at k=1 (both storages, 96 MB scoped VMEM suffices) and
    +1.3-1.9% at the k>1 window tiers once the coupled kernels' scoped
    limit is 118 MB (the k=4/tw=1024 window wants 109.4 MB; measured
    4096^2 bf16+ramp k=8 3524->3570, f32 k=4 3106->3165 - r4 kept k>1
    at 128 rows only because of the old 96 MB limit)."""
    del coupling_k  # one chain for every k since the 118 MB limit
    return (256, 128, 64, 32, 16, 8)


def tile_dims(cfg: SimConfig, wide: bool = False,
              fluid: bool = False, coupled: bool = False) -> Tuple[int, int]:
    """128-row tiles (r4); lane width by kernel flavor. wide=True:
    tw=1024 measured +6.5% over 512 on pure fluid 4096^2 and +0.9% on
    the coupled reduce kernel. th A/B on hardware (tools/ab_tiles.py,
    one r4 session, 4096^2, MLUPS at th 64/128/256): pure fluid f32
    19978/21461/22357, bf16 16949/19393/17484; static hoist
    12121/12642/OOM; coupled f32 1981/2212/2265, bf16+ramp
    2467/2732/2796 - th=128 wins or nearly wins every path (halo read
    amp 1.56x -> 1.41x + half the launches), th=256 only adds ~2% on
    coupled while LOSING 10% on bf16 fluid and blowing the 96 MB
    scoped-VMEM budget on the static-hoist kernel (103.5 MB), so 128
    is the global default for the paths NOT flavored below. The A/B's
    th=256 winners become per-path flavors (r4):
    - `fluid=True` (f32 storage only): pure-fluid kernels, +4.2%
      (no stamp-tile coupling, no bf16 VMEM pressure);
    - `coupled=True` (any storage, any coupling_k since r5):
      fused_step_imb_reduce(+_multi), +2.3-2.4% at k=1 (2265 vs 2212
      f32, 2796 vs 2732 bf16+ramp) and +1.3-1.9% at the k>1 window
      tiers under the 118 MB coupled scoped-VMEM limit (3570/3165 at
      k=8 bf16+ramp / k=4 f32). The whole binning chain follows:
      pallas_stamp.tile_dims and parallel/_pallas_step.canvas_pads
      derive from the same coupled_tile_rows (the fused kernel
      asserts stamp rows == lattice tile rows, so a mismatch anywhere
      in the chain fails loudly at trace time).
    The static-hoist kernel keeps 128 (its th=256 window is 103.5 MB,
    over the 96 MB scoped-VMEM budget) - it consumes the dense solid
    stack, not the binning, so its tile height is independent.

    LBMDEM_TH / LBMDEM_TW env vars override the defaults for hardware
    A/Bs (tools/ab_tiles.py) - best-effort: ignored where they cannot
    tile the config (small test grids, shard-local frames)."""
    import os

    if coupled:
        # the whole coupled chain (kernel, stamp tiles, canvas pads)
        # shares coupled_tile_rows - see its docstring for the k>1
        # scoped-VMEM rationale
        rows = coupled_tile_rows(cfg.coupling_k)
    elif fluid and cfg.f_storage != "bfloat16":
        rows = (256, 128, 64, 32, 16, 8)
    else:
        rows = (128, 64, 32, 16, 8)
    th = next((t for t in rows if cfg.ny % t == 0), None)
    cands = (1024, 512, 256, 128) if wide else (512, 256, 128)
    tw = next((t for t in cands if cfg.nx % t == 0), None)
    assert th and tw, (
        f"lattice {cfg.ny}x{cfg.nx} needs ny%8==0 and nx%128==0 for the "
        f"fused Pallas path"
    )
    _, hy, _ = _storage(cfg)
    th_env, tw_env = os.environ.get("LBMDEM_TH"), os.environ.get("LBMDEM_TW")
    if th_env:
        t = int(th_env)
        # best-effort: small internal configs (test grids, shard-local
        # frames) keep their default when the override cannot tile them
        if cfg.ny % t == 0 and t % hy == 0:
            th = t
    if tw_env:
        t = int(tw_env)
        if cfg.nx % t == 0 and t % _HX == 0:
            tw = t
    return th, tw


def _vmem_limit(default_mb: int = 96) -> int:
    """Scoped-VMEM limit for the lattice kernels (bytes). 96 MB is the
    qualified default; the COUPLED reduce kernels pass 118 (the th=256
    window tier wants ~110 MB at k=4/tw=1024 - a measured win at every
    coupling_k, see coupled_tile_rows; v5e VMEM is 128 MB total, so
    leave headroom). LBMDEM_VMEM_MB overrides at trace time for
    hardware A/Bs (tools/ab_tiles.py)."""
    import os

    return int(os.environ.get("LBMDEM_VMEM_MB", str(default_mb))) * 2**20


def _collide_window(win, cfg: SimConfig, eps=None, usx=None, usy=None,
                    shift: float = 0.0):
    """Moments + (NT-blended) BGK/TRT + Guo forcing on a (9, H, W) window.

    Returns (fpost list of 9 (H, W) planes, phi (2, H, W) or None).

    shift != 0.0: the window holds SHIFTED populations g_i = f_i -
    w_i*shift (bf16 storage mode, lbm.storage_shift). The whole update
    keeps its exact form with feq -> geq = feq - w_i*shift: moments
    need only the rho offset (sum(w)=1, sum(w e)=0), BGK/IMB/Guo/BB
    shifts cancel (w_opp = w_i), and phi stays physical.

    PAIR-SYMMETRIC ALGEBRA (the VPU-bound coupled collide measured
    ~2.1 ms/step at 4096^2): with e_opp = -e and w_opp = w, every
    equilibrium splits into an even and an odd part per direction pair,
        feq_i  = E + O,   feq_opp = E - O,
        E = w (rho_b + rho (4.5 eu^2 - 1.5 u^2)),  O = 3 w rho eu,
    so the 8 non-rest equilibria cost 4 evaluations; the IMB source
    collapses the same way: with W = f_opp - f_i, P = E_s - E_f,
    Q = O_s + O_f,
        Omega_i  =  W + P + Q,   Omega_opp = -W + P - Q,
    and the momentum exchange per pair is phi -= e_i * 2B(W + Q)
    (the P parts cancel under e_i <-> -e_i). Guo's projection splits
    identically (even: 9 eu (e.g) - 3 u.g, odd: 3 e.g with e.g a
    static scalar). Same update, ~2/3 the vector ops.
    """
    tau = cfg.tau
    w_c = lattice.W.astype(np.float32)
    ex_c = lattice.EX.astype(np.float32)
    ey_c = lattice.EY.astype(np.float32)
    gx, gy = cfg.gx, cfg.gy
    # direction pairs (i < opp(i)) + the rest population 0
    pairs = [(i, int(lattice.OPP[i])) for i in range(1, 9)
             if i < int(lattice.OPP[i])]

    trt = cfg.trt_lambda  # 0.0 = BGK; > 0 = TRT magic parameter
    # pair-form moments: with S = f_i + f_opp, D = f_i - f_opp,
    # rho = f0 + sum S and j = sum e_i D (4 adds + 4 subs + 8 signed
    # adds vs 8 adds + 12 mul-adds); D doubles as the coupled path's
    # W = f_opp - f_i term below, and (S, D) ARE the TRT even/odd
    # decomposition (f± = (S ± ... )/2), so TRT costs no extra moments
    Ds = {}
    Ss = {}
    rho_g = win[0]
    jx = None
    jy = None
    for i, io in pairs:
        S = win[i] + win[io]
        if trt > 0.0:
            Ss[i] = S
        rho_g = rho_g + S
        D = win[i] - win[io]
        Ds[i] = D
        ex, ey = int(lattice.E[i, 0]), int(lattice.E[i, 1])
        if ex:
            t = D if ex > 0 else -D
            jx = t if jx is None else jx + t
        if ey:
            t = D if ey > 0 else -D
            jy = t if jy is None else jy + t
    rho = rho_g + np.float32(shift) if shift != 0.0 else rho_g
    inv_rho = 1.0 / rho
    ux = (jx + 0.5 * gx) * inv_rho
    uy = (jy + 0.5 * gy) * inv_rho
    usq = ux * ux + uy * uy
    # rho_b is the density the '1' in feq multiplies: the raw (shifted)
    # sum in storage-shift mode, so geq = feq - w*shift exactly
    rho_b = rho_g if shift != 0.0 else rho
    rho3 = 3.0 * rho

    def eu_of(i, ux_, uy_):
        """e_i . u as +-adds (components are -1/0/+1)."""
        ex, ey = int(lattice.E[i, 0]), int(lattice.E[i, 1])
        t = None
        if ex:
            t = ux_ if ex > 0 else -ux_
        if ey:
            if t is None:
                t = uy_ if ey > 0 else -uy_
            else:
                t = t + uy_ if ey > 0 else t - uy_
        return t

    def eo_parts(i, ux_, uy_, m15sq):
        """(E, O) equilibrium parts for pair representative i.
        m15sq = -1.5*|u|^2 precomputed once per velocity field."""
        eu = eu_of(i, ux_, uy_)
        E = w_c[i] * (rho_b + rho * (4.5 * (eu * eu) + m15sq))
        return E, (w_c[i] * rho3) * eu, eu

    m15 = -1.5 * usq
    feq0 = w_c[0] * (rho_b + rho * m15)
    fparts = {i: eo_parts(i, ux, uy, m15) for i, _ in pairs}

    coupled = eps is not None
    feqs = None
    if cfg.smagorinsky > 0.0:
        # LES needs all 9 equilibria up front (non-eq stress norm)
        feqs = [feq0] * 9
        for i, io in pairs:
            E, O, _ = fparts[i]
            feqs[i] = E + O
            feqs[io] = E - O
        # Smagorinsky LES (C8): tau_eff from the non-equilibrium stress
        # norm, same closed form as the oracle (ops/lbm.smagorinsky_tau)
        pxx = jnp.zeros_like(rho)
        pyy = jnp.zeros_like(rho)
        pxy = jnp.zeros_like(rho)
        for i in range(1, 9):
            fneq = win[i] - feqs[i]
            if ex_c[i]:
                pxx = pxx + (ex_c[i] * ex_c[i]) * fneq
            if ey_c[i]:
                pyy = pyy + (ey_c[i] * ey_c[i]) * fneq
            if ex_c[i] and ey_c[i]:
                pxy = pxy + (ex_c[i] * ey_c[i]) * fneq
        pnorm = jnp.sqrt(pxx * pxx + pyy * pyy + 2.0 * pxy * pxy)
        c_les = np.float32(18.0 * np.sqrt(2.0) * cfg.smagorinsky**2)
        tau = 0.5 * (tau + jnp.sqrt(tau * tau + c_les * pnorm / rho))

    if coupled:
        eps_c = jnp.clip(eps, 0.0, 1.0)
        tm = tau - 0.5
        if cfg.nt_mode == "lambda":
            # Lambda-consistent blend (imb.nt_weight mode="lambda"):
            # weight the odd-mode solid operator by tau^- - 1/2
            tm = 0.1875 / tm
        B = eps_c * tm / ((1.0 - eps_c) + tm)
        one_minus_B = 1.0 - B
        usq_s = usx * usx + usy * usy
        m15_s = -1.5 * usq_s
        feq0_s = w_c[0] * (rho_b + rho * m15_s)
        sparts = {i: eo_parts(i, usx, usy, m15_s) for i, _ in pairs}
        phix = jnp.zeros_like(rho)
        phiy = jnp.zeros_like(rho)

    inv_tau = 1.0 / tau
    force_pref = 1.0 - 0.5 * inv_tau
    if trt > 0.0:
        # odd-moment rate from the magic parameter (lbm.trt_tau_minus);
        # tau may be a per-cell array under LES - all elementwise
        inv_tau_m = 1.0 / (0.5 + trt / (tau - 0.5))
        force_pref_m = 1.0 - 0.5 * inv_tau_m
    forced = gx != 0.0 or gy != 0.0
    if forced:
        ug3 = 3.0 * (ux * gx + uy * gy)  # shared even Guo term

    def guo_parts(i, eu):
        """(even, odd) of the prefactor-scaled Guo projection for pair
        representative i; the odd part's 3 e.g is a static scalar that
        folds into w. TRT scales the odd part by (1 - 1/(2 tau-))."""
        ex, ey = int(lattice.E[i, 0]), int(lattice.E[i, 1])
        eg = ex * gx + ey * gy
        even = (w_c[i] * force_pref) * ((9.0 * eg) * eu - ug3)
        opref = force_pref_m if trt > 0.0 else force_pref
        odd = (w_c[i] * np.float32(3.0 * eg)) * opref if eg != 0.0 else None
        return even, odd

    outs = [None] * 9
    relax = one_minus_B * inv_tau if coupled else inv_tau
    # rest population
    fp0 = win[0] - relax * (win[0] - feq0)
    if coupled:
        # Omega_0 = feq_s0 - feq0 (the f terms cancel at e=0)
        fp0 = fp0 + B * (feq0_s - feq0)
    if forced:
        src0 = (w_c[0] * force_pref) * (-ug3)
        fp0 = fp0 + (one_minus_B * src0 if coupled else src0)
    outs[0] = fp0

    for i, io in pairs:
        Ef, Of, eu = fparts[i]
        if trt > 0.0:
            # TRT relaxation terms: even/odd non-equilibrium parts from
            # the pair sum/difference already in hand
            ne_e = inv_tau * (0.5 * Ss[i] - Ef)
            ne_o = inv_tau_m * (0.5 * Ds[i] - Of)
            rt_i = ne_e + ne_o
            rt_o = ne_e - ne_o
        if coupled:
            Es, Os, _ = sparts[i]
            P = Es - Ef
            Q = Os + Of
            WQ = Q - Ds[i]  # W = f_opp - f_i = -D from the moments
            if trt > 0.0:
                fp_i = win[i] - one_minus_B * rt_i + B * (WQ + P)
                fp_o = win[io] - one_minus_B * rt_o + B * (P - WQ)
            else:
                fp_i = win[i] - relax * (win[i] - (Ef + Of)) + B * (WQ + P)
                fp_o = win[io] - relax * (win[io] - (Ef - Of)) + B * (P - WQ)
            # phi -= e_i * (B*Omega_i) + e_io * (B*Omega_io)
            #      = e_i * 2B(W + Q)
            pair_phi = (2.0 * B) * WQ
            ex, ey = int(lattice.E[i, 0]), int(lattice.E[i, 1])
            if ex:
                phix = phix - pair_phi if ex > 0 else phix + pair_phi
            if ey:
                phiy = phiy - pair_phi if ey > 0 else phiy + pair_phi
        elif trt > 0.0:
            fp_i = win[i] - rt_i
            fp_o = win[io] - rt_o
        else:
            fp_i = win[i] - relax * (win[i] - (Ef + Of))
            fp_o = win[io] - relax * (win[io] - (Ef - Of))
        if forced:
            even, odd = guo_parts(i, eu)
            src_i = even + odd if odd is not None else even
            src_o = even - odd if odd is not None else even
            if coupled:
                fp_i = fp_i + one_minus_B * src_i
                fp_o = fp_o + one_minus_B * src_o
            else:
                fp_i = fp_i + src_i
                fp_o = fp_o + src_o
        outs[i] = fp_i
        outs[io] = fp_o
    phi = jnp.stack([phix, phiy]) if coupled else None
    return outs, phi


def _window_copies(src_hbm, dst_vmem, sems, y0, x0, th, tw, ny, nx,
                   prehalo=False, hy: int = _HY):
    """The 9 aligned chunk copies filling a (C, th+2*hy, tw+2*_HX)
    window with wrap-safe offsets. Pure descriptor construction: call
    .start() on one grid step and reconstruct + .wait() on the next
    (the double-buffering pattern from the Pallas guide).

    hy: row chunk granule = the dst VMEM tile height (8 for f32, 16 for
    bf16 storage - DMA slices of tiled memrefs must be whole tiles).

    prehalo "y": the source array already carries 2*hy extra rows
    (multi-chip shards get their y halos from a ppermute exchange, not
    from periodic wrap), so row offsets shift by +hy and never wrap.
    prehalo "yx": additionally 2*_HX extra columns (2D mesh: x halos
    exchanged too), col offsets shift by +_HX."""
    ny32 = jnp.int32(ny)
    nx32 = jnp.int32(nx)
    # all offsets are congruent 0 mod the tile granule (y0 = i*th,
    # th/ny multiples of hy; x0 = j*tw, tw/nx multiples of 128) - Mosaic
    # needs the pl.multiple_of proof to slice tiled memrefs dynamically.
    if prehalo:
        rows = [
            (pl.multiple_of(y0, hy), 0, hy),
            (pl.multiple_of(y0 + hy, hy), hy, th),
            (pl.multiple_of(y0 + hy + th, hy), hy + th, hy),
        ]
    else:
        rows = [
            (pl.multiple_of(jax.lax.rem(y0 - hy + ny32, ny32), hy), 0, hy),
            (pl.multiple_of(y0, hy), hy, th),
            (pl.multiple_of(jax.lax.rem(y0 + th, ny32), hy), hy + th, hy),
        ]
    if prehalo == "yx":
        cols = [
            (pl.multiple_of(x0, _HX), 0, _HX),
            (pl.multiple_of(x0 + _HX, _HX), _HX, tw),
            (pl.multiple_of(x0 + _HX + tw, _HX), _HX + tw, _HX),
        ]
    else:
        cols = [
            (pl.multiple_of(jax.lax.rem(x0 - _HX + nx32, nx32), _HX), 0, _HX),
            (pl.multiple_of(x0, _HX), _HX, tw),
            (pl.multiple_of(jax.lax.rem(x0 + tw, nx32), _HX), _HX + tw, _HX),
        ]
    copies = []
    k = 0
    for ys, yd, rh in rows:
        for xs, xd, cw in cols:
            copies.append(
                pltpu.make_async_copy(
                    src_hbm.at[:, pl.ds(ys, rh), pl.ds(xs, cw)],
                    dst_vmem.at[:, pl.ds(yd, rh), pl.ds(xd, cw)],
                    sems.at[k],
                )
            )
            k += 1
    return copies


def _tile_xy(lin, ntx, th, tw):
    return (lin // ntx) * th, jax.lax.rem(lin, jnp.int32(ntx)) * tw


def _pipeline_window(copies_for, lin, slot, total):
    """The shared double-buffering scaffold of every windowed kernel:
    seed tile 0's copies on the first grid step, prefetch tile lin+1's
    into the other slot, then wait on tile lin's. `copies_for(lin, slot)`
    must be a pure descriptor constructor (started on one grid step and
    reconstructed + waited on the next - the Pallas guide pattern)."""

    @pl.when(lin == 0)
    def _():
        for c in copies_for(lin, slot):
            c.start()

    @pl.when(lin + 1 < total)
    def _():
        for c in copies_for(lin + 1, jax.lax.rem(lin + 1, jnp.int32(2))):
            c.start()

    for c in copies_for(lin, slot):
        c.wait()


def _stream_and_bb(fpost, cfg, th, tw, iy, ix, nty, ntx, prehalo=False,
                   shift=0.0):
    """Pull-stream 9 (th+2, tw+2*_HX) planes into the (9, th, tw) output
    tile, with bounce-back at global walls. iy/ix are tile grid coords.

    shift != 0 (bf16 f-storage): the planes hold shifted populations
    g_i = f_i - w_i*shift. Bounce-back is shift-invariant (w_opp = w_i)
    and the Zou/He closures take `shift` directly (their density sum is
    the only shift-dependent term — see lbm.zou_he_inlet)."""
    outs = []
    for i in range(9):
        ex, ey = int(lattice.E[i, 0]), int(lattice.E[i, 1])
        plane = fpost[i]
        if ex:
            plane = pltpu.roll(plane, ex % plane.shape[1], 1)
        outs.append(
            jax.lax.slice(plane, (1 - ey, _HX), (1 - ey + th, _HX + tw))
        )

    col = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0)

    def bbslice(io, corr):
        # corr = 6 w_i rho0 (e_i . u_w): the half-way moving-wall term
        # (oracle: lbm.apply_bounce_back). Static per population, 0.0
        # for resting walls, so the add folds away in the common case.
        sl = jax.lax.slice(fpost[io], (1, _HX), (1 + th, _HX + tw))
        return sl + np.float32(corr) if corr != 0.0 else sl

    def wall_corr(i, uwx, uwy):
        return lattice.wall_corr(i, uwx, uwy, cfg.rho0)

    # prehalo: multi-chip shards apply global y-edge (and, on a 2D
    # mesh, x-edge) bounce-back in the caller (it needs shard position).
    # Order matches the oracle (south, north, THEN west, east): at a
    # corner cell both rules target the same diagonal population with
    # different moving-wall corrections, and the x-wall rule wins.
    skip_y_bb = bool(prehalo)
    skip_x_bb = prehalo == "yx"
    if cfg.bc_south == WALL and not skip_y_bb:
        at = (row == 0) & (iy == 0)
        for i in (int(j) for j in lattice.IN_N):
            outs[i] = jnp.where(
                at, bbslice(int(lattice.OPP[i]), wall_corr(i, cfg.uw_south, 0.0)),
                outs[i])
    if cfg.bc_north == WALL and not skip_y_bb:
        at = (row == th - 1) & (iy == nty - 1)
        for i in (int(j) for j in lattice.IN_S):
            outs[i] = jnp.where(
                at, bbslice(int(lattice.OPP[i]), wall_corr(i, cfg.uw_north, 0.0)),
                outs[i])
    if cfg.bc_west == WALL and not skip_x_bb:
        at = (col == 0) & (ix == 0)
        for i in (int(j) for j in lattice.IN_E):
            outs[i] = jnp.where(
                at, bbslice(int(lattice.OPP[i]), wall_corr(i, 0.0, cfg.uw_west)),
                outs[i])
    if cfg.bc_east == WALL and not skip_x_bb:
        at = (col == tw - 1) & (ix == ntx - 1)
        for i in (int(j) for j in lattice.IN_W):
            outs[i] = jnp.where(
                at, bbslice(int(lattice.OPP[i]), wall_corr(i, 0.0, cfg.uw_east)),
                outs[i])
    if cfg.bc_west == "inlet" and not prehalo:
        # Zou/He open boundaries (shared closure: lbm.zou_he_inlet),
        # applied after BB so wall corners supply the tangential knowns.
        # The profile is re-evaluated in traced f32 from the traced tile
        # row (unlike the oracle/sharded paths, which slice a host-f64
        # numpy array): the in-kernel inlet column can differ from the
        # oracle's by ~1 f32 ulp per row - inside the 1e-6 parity
        # tolerance, and a constant-operand plumbing through all three
        # windowed kernels is not worth that ulp.
        # Skipped in EVERY prehalo (multi-chip) mode - even 1D, where
        # x-walls do run in-kernel: the profile needs GLOBAL y (the
        # kernel only has the shard-local row) and the corner knowns
        # must come from the externally-fixed y-wall rows; the sharded
        # caller applies sharding._apply_open_boundaries_sharded after
        # its wall fixups instead.
        at = (col == 0) & (ix == 0)
        yg = (iy * th + row).astype(jnp.float32) + 0.5
        H = np.float32(cfg.ny)
        if cfg.inlet_profile == "poiseuille":
            u = (np.float32(4.0 * cfg.u_inlet) / (H * H)) * yg * (H - yg)
        else:
            u = jnp.full((th, tw), np.float32(cfg.u_inlet))
        from lbmdem_tpu.ops.lbm import zou_he_inlet

        n1, n5, n8 = zou_he_inlet(outs, u, shift=np.float32(shift))
        outs[1] = jnp.where(at, n1, outs[1])
        outs[5] = jnp.where(at, n5, outs[5])
        outs[8] = jnp.where(at, n8, outs[8])
    if cfg.bc_east == "outlet" and not prehalo:
        from lbmdem_tpu.ops.lbm import zou_he_outlet

        at = (col == tw - 1) & (ix == ntx - 1)
        rho_o = np.float32(cfg.rho_outlet or cfg.rho0)
        n3, n7, n6 = zou_he_outlet(outs, rho_o, shift=np.float32(shift))
        outs[3] = jnp.where(at, n3, outs[3])
        outs[7] = jnp.where(at, n7, outs[7])
        outs[6] = jnp.where(at, n6, outs[6])
    return jnp.stack(outs)


def _fluid_kernel(f_hbm, out_ref, win, sems, *, cfg: SimConfig, th: int,
                  tw: int, prehalo: bool = False, hy: int = _HY,
                  shift: float = 0.0):
    iy = pl.program_id(0)
    ix = pl.program_id(1)
    nty = pl.num_programs(0)
    ntx = pl.num_programs(1)
    lin = iy * ntx + ix
    slot = jax.lax.rem(lin, jnp.int32(2))

    def copies_for(step_lin, s):
        y0, x0 = _tile_xy(step_lin, ntx, th, tw)
        return _window_copies(
            f_hbm, win.at[s], sems.at[s], y0, x0, th, tw, cfg.ny, cfg.nx,
            prehalo, hy=hy,
        )

    _pipeline_window(copies_for, lin, slot, nty * ntx)
    wv = win[slot, :, hy - 1 : hy + th + 1, :]  # (9, th+2, tw+2*_HX)
    if wv.dtype != jnp.float32:
        wv = wv.astype(jnp.float32)
    fpost, _ = _collide_window(wv, cfg, shift=shift)
    out_ref[:] = _stream_and_bb(fpost, cfg, th, tw, iy, ix, nty, ntx,
                                prehalo=prehalo,
                                shift=shift).astype(out_ref.dtype)


def fused_step_fluid(f: jax.Array, cfg: SimConfig, prehalo: bool = False,
                     out_buf: jax.Array = None) -> jax.Array:
    """One pure-fluid LBM step as a single fused Pallas kernel.

    prehalo=True takes f of shape (9, ny + 16, nx) whose first/last 8
    rows are exchanged neighbor halos (multi-chip shards); cfg.ny is the
    local interior height and y-wall bounce-back is left to the caller.

    out_buf (same shape as the output) donates a DEAD buffer for the
    result via input_output_aliases: without it, XLA's while-carry
    in-place rule copies the kernel output back into the carry slot -
    a full f copy (1.2 GB, ~1.8 ms at 4096^2) EVERY step. Callers that
    loop ping-pong two f buffers (see Simulation._chunk_fn's unrolled
    double step). Aliasing f itself would race: later tiles' halo
    windows read rows earlier tiles already overwrote."""
    fdt, hy, shift = _storage(cfg)
    assert f.dtype == fdt, (
        f"Pallas path wants {fdt} storage (use_pallas=False for f64)"
    )
    th, tw = tile_dims(cfg, wide=True, fluid=True)
    assert f.shape[1] == cfg.ny + (2 * hy if prehalo else 0)
    assert f.shape[2] == cfg.nx + (2 * _HX if prehalo == "yx" else 0)
    kernel = functools.partial(_fluid_kernel, cfg=cfg, th=th, tw=tw,
                               prehalo=prehalo, hy=hy, shift=shift)
    operands = [f]
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    aliases = {}
    if out_buf is not None:
        assert out_buf.shape == (9, cfg.ny, cfg.nx)
        operands.append(out_buf)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        aliases = {1: 0}
        inner = kernel
        kernel = lambda f_hbm, dead, *rest: inner(f_hbm, *rest)
    return pl.pallas_call(
        kernel,
        grid=(cfg.ny // th, cfg.nx // tw),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (9, th, tw), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((9, cfg.ny, cfg.nx), fdt),
        scratch_shapes=[
            pltpu.VMEM((2, 9, th + 2 * hy, tw + 2 * _HX), fdt),
            pltpu.SemaphoreType.DMA((2, 9)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # default tiles fit the 16 MB scoped-VMEM default, but the
            # LBMDEM_TH/TW overrides (tools/ab_tiles.py) can exceed it
            vmem_limit_bytes=_vmem_limit(),
        ),
        input_output_aliases=aliases,
        interpret=_interpret(),
    )(*operands)


def _stream_and_bb_window(fpost, cfg, th, tw, iy, ix, nty, ntx, edges=None,
                          shift=0.0, oy=None, ny_glob=None):
    """Pull-stream 9 full (H, W) window planes IN PLACE (periodic rolls;
    the wrap garbage lands in the halo margin, which the temporal-block
    validity argument consumes 1 cell/side/step), with half-way
    bounce-back applied at GLOBAL wall rows/cols across the whole
    window.

    Full-window BB (vs the output-tile-only BB of `_stream_and_bb`) is
    load-bearing for temporal blocking with MIXED boundaries: on a
    periodic axis the halo holds wrapped TRUE data that must keep
    evolving exactly through the inner steps - including the other
    axis's wall rule (e.g. periodic-x channel flow: the x-halo columns
    contain wall-adjacent rows). On a wall axis the halo beyond the
    wall is garbage, but BB cuts the dependency cone at the wall row
    itself, so it never leaks in. Same corner order as the oracle
    (south, north, THEN west, east: the x-wall rule wins).

    edges: None single-chip, else 4 traced bools (south, north, west,
    east shard-at-global-edge flags from the mesh position) ANDed into
    the wall conditions - multi-chip shards apply BB in-kernel here
    (unlike the 1-step prehalo kernels, whose callers fix edges up
    outside: inner temporal steps are invisible to the caller)."""
    H, W = fpost[0].shape
    outs = []
    for i in range(9):
        ex, ey = int(lattice.E[i, 0]), int(lattice.E[i, 1])
        p = fpost[i]
        if ey:
            p = pltpu.roll(p, ey % H, 0)
        if ex:
            p = pltpu.roll(p, ex % W, 1)
        outs.append(p)

    row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)

    def fix(at, idxs, uwx, uwy):
        for i in (int(j) for j in idxs):
            src = fpost[int(lattice.OPP[i])]
            corr = lattice.wall_corr(i, uwx, uwy, cfg.rho0)
            if corr != 0.0:
                src = src + np.float32(corr)
            outs[i] = jnp.where(at, src, outs[i])

    on = (lambda e: True) if edges is None else (lambda e: e)
    s_on, n_on, w_on, e_on = edges if edges is not None else (1, 1, 1, 1)
    # global wall positions in window coords: window row hy is global
    # row y0, col _HX is global col x0 (walls only exist at the domain
    # edge tiles; wrapped halo copies of wall rows never need BB because
    # wrap-as-true-data only matters on periodic axes)
    hy = (H - th) // 2  # halo rows per side (8 f32 / 16 bf16 storage)
    if cfg.bc_south == WALL:
        fix((row == hy) & (iy == 0) & on(s_on), lattice.IN_N,
            cfg.uw_south, 0.0)
    if cfg.bc_north == WALL:
        fix((row == hy + th - 1) & (iy == nty - 1) & on(n_on),
            lattice.IN_S, cfg.uw_north, 0.0)
    if cfg.bc_west == WALL:
        fix((col == _HX) & (ix == 0) & on(w_on), lattice.IN_E, 0.0,
            cfg.uw_west)
    if cfg.bc_east == WALL:
        fix((col == _HX + tw - 1) & (ix == ntx - 1) & on(e_on),
            lattice.IN_W, 0.0, cfg.uw_east)
    if cfg.bc_west == "inlet":
        # Zou/He open boundaries per inner step. The closure
        # reconstructs the incoming populations from SAME-CELL
        # post-stream knowns, all of which pull from in-domain cells,
        # so it anchors the validity cone at the boundary column
        # exactly like wall BB: the garbage the roll wraps into the
        # halo beyond can only re-enter through the populations the
        # closure overwrites. Applied on ALL window rows: on a
        # periodic y axis the halo rows are wrapped true data (global
        # y wraps mod the GLOBAL ny for the profile); on wall axes
        # they are garbage in, garbage out. Sharded (edges set): the
        # shard's global row offset `oy` and the global lattice height
        # `ny_glob` arrive with the mesh-position flags, and the
        # closure fires only on global-edge shards.
        from lbmdem_tpu.ops.lbm import zou_he_inlet, zou_he_outlet

        if edges is None:
            at_w = (col == _HX) & (ix == 0)
            at_e = (col == _HX + tw - 1) & (ix == ntx - 1)
            oy_i = 0
            nyg = cfg.ny
        else:
            at_w = (col == _HX) & (ix == 0) & w_on
            at_e = (col == _HX + tw - 1) & (ix == ntx - 1) & e_on
            oy_i = oy
            nyg = ny_glob
        yg_i = oy_i + iy * th + (row - hy)
        if cfg.bc_south != WALL:
            yg_i = jax.lax.rem(yg_i + jnp.int32(nyg), jnp.int32(nyg))
        yg = yg_i.astype(jnp.float32) + 0.5
        Hd = np.float32(nyg)
        if cfg.inlet_profile == "poiseuille":
            u = (np.float32(4.0 * cfg.u_inlet) / (Hd * Hd)) * yg * (Hd - yg)
        else:
            u = jnp.full((H, W), np.float32(cfg.u_inlet))
        n1, n5, n8 = zou_he_inlet(outs, u, shift=np.float32(shift))
        outs[1] = jnp.where(at_w, n1, outs[1])
        outs[5] = jnp.where(at_w, n5, outs[5])
        outs[8] = jnp.where(at_w, n8, outs[8])
        rho_o = np.float32(cfg.rho_outlet or cfg.rho0)
        n3, n7, n6 = zou_he_outlet(outs, rho_o, shift=np.float32(shift))
        outs[3] = jnp.where(at_e, n3, outs[3])
        outs[7] = jnp.where(at_e, n7, outs[7])
        outs[6] = jnp.where(at_e, n6, outs[6])
    return outs


def _fluid_multi_kernel(f_hbm, out_ref, win, sems, *, cfg: SimConfig,
                        th: int, tw: int, k: int, prehalo=False,
                        edge_ref=None, hy: int = _HY, shift: float = 0.0,
                        ny_glob: int = 0):
    """k pure-fluid LBM steps per HBM round-trip (temporal blocking).

    The halo-extended window (th+16, tw+256) already carries an 8-row /
    128-col margin; each inner step's streaming consumes one cell of
    validity per side (roll wrap + garbage pull), so k <= _HY steps can
    evolve entirely in VMEM/vregs before the (th, tw) interior is
    written back. Walls anchor validity at the domain edge (BB cuts the
    dependency cone), periodic halos are wrapped true data that evolves
    exactly. Cuts f HBM traffic per step by ~k at the cost of
    recomputing the collide on the (1.25 x 1.25) halo overlap."""
    iy = pl.program_id(0)
    ix = pl.program_id(1)
    nty = pl.num_programs(0)
    ntx = pl.num_programs(1)
    lin = iy * ntx + ix
    slot = jax.lax.rem(lin, jnp.int32(2))

    def copies_for(step_lin, s):
        y0, x0 = _tile_xy(step_lin, ntx, th, tw)
        return _window_copies(
            f_hbm, win.at[s], sems.at[s], y0, x0, th, tw, cfg.ny, cfg.nx,
            prehalo, hy=hy,
        )

    _pipeline_window(copies_for, lin, slot, nty * ntx)
    edges = oy = None
    if edge_ref is not None:
        # [s, n, w, e global-edge flags, global row offset, 0, 0, 0]
        edges = tuple(edge_ref[0, 0, j] != 0 for j in range(4))
        oy = edge_ref[0, 0, 4]
    planes = [win[slot, i] for i in range(9)]
    if planes[0].dtype != jnp.float32:
        planes = [p.astype(jnp.float32) for p in planes]
    for _ in range(k):
        fpost, _ = _collide_window(planes, cfg, shift=shift)
        planes = _stream_and_bb_window(fpost, cfg, th, tw, iy, ix, nty, ntx,
                                       edges=edges, shift=shift, oy=oy,
                                       ny_glob=ny_glob or cfg.ny)
    out_ref[:] = jnp.stack(
        [jax.lax.slice(p, (hy, _HX), (hy + th, _HX + tw)) for p in planes]
    ).astype(out_ref.dtype)


def fused_step_fluid_multi(f: jax.Array, cfg: SimConfig, k: int,
                           prehalo=False, edges: jax.Array = None,
                           out_buf: jax.Array = None,
                           ny_glob: int = 0) -> jax.Array:
    """k fused pure-fluid LBM steps in ONE kernel pass (k <= 8).

    Temporal blocking over the existing halo window: f is read once
    (1.56x halo amplification) and written once per k steps instead of
    per step. k=1-equivalent physics (parity-tested vs k oracle steps).
    TPU A/B at 4096^2: k=4 -> 1.109 ms/step (15127 MLUPS) vs k=1 2.348
    (see simulation.TEMPORAL_K).

    prehalo: multi-chip shards - f carries 8 exchanged halo rows per
    side ("yx": also 128 halo cols), which is exactly the k<=8
    dependency-cone margin, so ONE ppermute exchange feeds k steps
    (k-fold ICI amortization). Unlike the 1-step prehalo kernels,
    global-edge bounce-back AND the Zou/He open-boundary closures run
    IN-KERNEL (inner steps are invisible to the caller): `edges` must
    be 4 or 5 traced int32s (south, north, west, east
    shard-at-global-edge flags from the mesh position; slot 4 = the
    shard's global row offset, needed by the inlet profile), and
    `ny_glob` the GLOBAL lattice height (cfg is the local config).

    out_buf: dead donated buffer, see fused_step_fluid."""
    fdt, hy, shift = _storage(cfg)
    assert f.dtype == fdt
    assert 1 <= k <= hy, f"temporal block k={k} exceeds the {hy}-row halo"
    if k == 1 and not prehalo:
        return fused_step_fluid(f, cfg, out_buf=out_buf)
    th, tw = tile_dims(cfg, wide=True, fluid=True)
    assert f.shape[1] == cfg.ny + (2 * hy if prehalo else 0)
    assert f.shape[2] == cfg.nx + (2 * _HX if prehalo == "yx" else 0)
    assert (edges is not None) == bool(prehalo)
    kernel = functools.partial(_fluid_multi_kernel, cfg=cfg, th=th, tw=tw,
                               k=k, prehalo=prehalo, hy=hy, shift=shift,
                               ny_glob=ny_glob)
    operands = [f]
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    if prehalo:
        e = edges.astype(jnp.int32).reshape(-1)
        # pad [s, n, w, e] with [oy, 0, 0, 0] when the caller sends only
        # the 4 flags (no open boundaries)
        e = jnp.concatenate([e, jnp.zeros((8 - e.shape[0],), jnp.int32)])
        operands.append(e.reshape(1, 1, 8))
        in_specs.append(
            pl.BlockSpec((1, 1, 8), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.SMEM)
        )
        inner_e = kernel
        kernel = (lambda f_hbm, eref, *rest:
                  inner_e(f_hbm, *rest, edge_ref=eref))
    aliases = {}
    if out_buf is not None:
        assert out_buf.shape == (9, cfg.ny, cfg.nx)
        di = len(operands)  # position of the dead buffer in kernel args
        aliases = {di: 0}
        operands.append(out_buf)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        inner = kernel
        kernel = lambda *args, _i=inner, _d=di: _i(*args[:_d], *args[_d + 1:])
    return pl.pallas_call(
        kernel,
        grid=(cfg.ny // th, cfg.nx // tw),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (9, th, tw), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((9, cfg.ny, cfg.nx), fdt),
        scratch_shapes=[
            pltpu.VMEM((2, 9, th + 2 * hy, tw + 2 * _HX), fdt),
            pltpu.SemaphoreType.DMA((2, 9)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # 8 inlined steps keep ~2 window-sized plane sets live in
            # vregs/VMEM spill on top of the 7.4 MB double-buffered
            # window - headroom over the 16 MB scoped default
            vmem_limit_bytes=_vmem_limit(),
        ),
        input_output_aliases=aliases,
        interpret=_interpret(),
    )(*operands)


def _imb_static_multi_kernel(f_hbm, s_hbm, out_ref, win, swin, sems, ssems,
                             *, cfg: SimConfig, th: int, tw: int, k: int,
                             hy: int = _HY, shift: float = 0.0,
                             prehalo=False, edge_ref=None, ny_glob: int = 0):
    """k coupled (NT-blended) LBM steps per HBM round-trip for STATIC
    solid fields (the static-solid hoist's chunk: every disk fixed at
    rest, so eps/us are loop constants).

    Temporal blocking's validity argument extends unchanged: the IMB
    collide is pointwise in (eps, usx, usy), and the solid window holds
    the TRUE constant values everywhere (it never decays like f's halo
    margin), so only f's streaming consumes the k <= hy dependency
    cone. Walls and Zou/He closures re-anchor per inner step exactly as
    in the pure-fluid multi kernel (_stream_and_bb_window). The hydro
    reduce is absent by design - the hoist zero-trips it anyway (drag
    is observed out-of-band via Simulation.hydro_forces)."""
    iy = pl.program_id(0)
    ix = pl.program_id(1)
    nty = pl.num_programs(0)
    ntx = pl.num_programs(1)
    lin = iy * ntx + ix
    slot = jax.lax.rem(lin, jnp.int32(2))

    def copies_for(step_lin, s):
        y0, x0 = _tile_xy(step_lin, ntx, th, tw)
        return _window_copies(
            f_hbm, win.at[s], sems.at[s], y0, x0, th, tw, cfg.ny, cfg.nx,
            prehalo, hy=hy,
        ) + _window_copies(
            s_hbm, swin.at[s], ssems.at[s], y0, x0, th, tw, cfg.ny, cfg.nx,
            prehalo,
        )

    _pipeline_window(copies_for, lin, slot, nty * ntx)
    edges = oy = None
    if edge_ref is not None:
        edges = tuple(edge_ref[0, 0, j] != 0 for j in range(4))
        oy = edge_ref[0, 0, 4]
    planes = [win[slot, i] for i in range(9)]
    if planes[0].dtype != jnp.float32:
        planes = [p.astype(jnp.float32) for p in planes]
    # bf16 f at hy=16 pads the window 8 rows beyond the f32 solid's:
    # align the solid planes to the f window rows (value-level slices)
    pad = hy - _HY
    sv = swin[slot]
    if pad:
        z = jnp.zeros((3, pad, tw + 2 * _HX), jnp.float32)
        sv = jnp.concatenate([z, sv, z], axis=1)
    eps_w, usx_w, usy_w = sv[0], sv[1], sv[2]
    for _ in range(k):
        fpost, _ = _collide_window(planes, cfg, eps=eps_w, usx=usx_w,
                                   usy=usy_w, shift=shift)
        planes = _stream_and_bb_window(fpost, cfg, th, tw, iy, ix, nty,
                                       ntx, edges=edges, shift=shift,
                                       oy=oy, ny_glob=ny_glob or cfg.ny)
    out_ref[:] = jnp.stack(
        [jax.lax.slice(p, (hy, _HX), (hy + th, _HX + tw)) for p in planes]
    ).astype(out_ref.dtype)


def fused_step_imb_static_multi(f: jax.Array, solid: jax.Array,
                                cfg: SimConfig, k: int,
                                out_buf: jax.Array = None,
                                prehalo=False, edges: jax.Array = None,
                                ny_glob: int = 0) -> jax.Array:
    """k fused coupled LBM steps per HBM round-trip over a STATIC
    (3, ny, nx) solid stack (the static-solid hoist's chunk kernel for
    all-fixed-at-rest scenes). Parity: k oracle coupled steps.

    prehalo: multi-chip shards - as in fused_step_fluid_multi, ONE
    ppermute exchange feeds k steps (f carries 2*hy halo rows, +2*_HX
    cols in "yx"; the solid carries 2*_HY rows at the f32 granule -
    constant true values from the canvas, so only f consumes the
    dependency cone), and global-edge BB + Zou/He run in-kernel via
    the `edges` flags/row-offset array (slot 4) and `ny_glob`."""
    fdt, hy, shift = _storage(cfg)
    assert f.dtype == fdt
    assert 1 <= k <= _HY, (
        f"static-coupled temporal block k={k} exceeds the {_HY}-row "
        f"solid halo"
    )
    th, tw = tile_dims(cfg, wide=True)
    assert f.shape[1] == cfg.ny + (2 * hy if prehalo else 0)
    assert f.shape[2] == cfg.nx + (2 * _HX if prehalo == "yx" else 0)
    s_shape = (3, cfg.ny + (2 * _HY if prehalo else 0),
               cfg.nx + (2 * _HX if prehalo == "yx" else 0))
    assert solid.shape == s_shape, (solid.shape, s_shape)
    assert (edges is not None) == bool(prehalo)
    kernel = functools.partial(_imb_static_multi_kernel, cfg=cfg, th=th,
                               tw=tw, k=k, hy=hy, shift=shift,
                               prehalo=prehalo, ny_glob=ny_glob)
    operands = [f, solid.astype(jnp.float32)]
    in_specs = [pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY)]
    if prehalo:
        e = edges.astype(jnp.int32).reshape(-1)
        e = jnp.concatenate([e, jnp.zeros((8 - e.shape[0],), jnp.int32)])
        operands.append(e.reshape(1, 1, 8))
        in_specs.append(
            pl.BlockSpec((1, 1, 8), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.SMEM)
        )
        inner_e = kernel
        kernel = (lambda f_hbm, s_hbm, eref, *rest:
                  inner_e(f_hbm, s_hbm, *rest, edge_ref=eref))
    aliases = {}
    if out_buf is not None:
        assert out_buf.shape == (9, cfg.ny, cfg.nx)
        di = len(operands)  # position of the dead buffer in kernel args
        aliases = {di: 0}
        operands.append(out_buf)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        inner = kernel
        kernel = lambda *args, _i=inner, _d=di: _i(*args[:_d], *args[_d + 1:])
    return pl.pallas_call(
        kernel,
        grid=(cfg.ny // th, cfg.nx // tw),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (9, th, tw), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((9, cfg.ny, cfg.nx), fdt),
        scratch_shapes=[
            pltpu.VMEM((2, 9, th + 2 * hy, tw + 2 * _HX), fdt),
            pltpu.VMEM((2, 3, th + 2 * _HY, tw + 2 * _HX), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 9)),
            pltpu.SemaphoreType.DMA((2, 9)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_vmem_limit(),
        ),
        input_output_aliases=aliases,
        interpret=_interpret(),
    )(*operands)


def _imb_reduce_kernel(
    f_hbm, s_hbm, data_ref, cnt_ref, out_ref, part_ref, win, swin, sems,
    ssems, wscr, *, cfg: SimConfig, th: int, tw: int, cap: int,
    eps_min: float, sub: int, hy: int = _HY, shift: float = 0.0,
    prehalo=False, oy: int = 0, ox: int = 0,
):
    """IMB collide-stream tile + in-kernel hydro force reduction.

    The momentum-exchange field phi never leaves VMEM: after the collide
    pass, each of the tile's `sub` stamp-granularity (th x 128) sub-tiles
    reduces its binned disks' share-weighted phi into per-slot partials
    (pallas_stamp.reduce_partials_banded). Replaces the separate reduce
    pass (one less launch, no phi/eps HBM round-trip).

    prehalo: multi-chip shards — f (at its storage granule hy) and the
    solid stack (at the f32 granule _HY) carry ppermute-exchanged halo
    rows (and cols in "yx" mode); global-edge bounce-back is the
    caller's job (parallel/_pallas_step.py edge fixups).

    oy/ox: static reduce-coordinate origin offsets — the sharded caller
    bins/gathers disk data in stamp-CANVAS coordinates (interior cell
    (y, x) = canvas cell (y+oy, x+ox)), so the per-disk rel coordinates
    evaluate against canvas-offset tile origins. Relative quantities
    only; the w_ref phi slices stay in tile-interior coords.
    """
    from lbmdem_tpu.ops.pallas_stamp import band_height, reduce_partials_banded

    iy = pl.program_id(0)
    ix = pl.program_id(1)
    nty = pl.num_programs(0)
    ntx = pl.num_programs(1)
    lin = iy * ntx + ix
    slot = jax.lax.rem(lin, jnp.int32(2))

    def copies_for(step_lin, s):
        y0, x0 = _tile_xy(step_lin, ntx, th, tw)
        return _window_copies(
            f_hbm, win.at[s], sems.at[s], y0, x0, th, tw, cfg.ny, cfg.nx,
            prehalo, hy=hy,
        ) + _window_copies(
            s_hbm, swin.at[s], ssems.at[s], y0, x0, th, tw, cfg.ny, cfg.nx,
            prehalo,
        )

    _pipeline_window(copies_for, lin, slot, nty * ntx)
    wv = win[slot, :, hy - 1 : hy + th + 1, :]
    if wv.dtype != jnp.float32:
        wv = wv.astype(jnp.float32)
    sv = swin[slot, :, _HY - 1 : _HY + th + 1, :]
    fpost, phi = _collide_window(wv, cfg, eps=sv[0], usx=sv[1], usy=sv[2],
                                 shift=shift)
    out_ref[:] = _stream_and_bb(fpost, cfg, th, tw, iy, ix, nty, ntx,
                                prehalo=prehalo,
                                shift=shift).astype(out_ref.dtype)

    # hydro reduction on the tile interior (rows 1..th+1 of the window);
    # wx/wy land in VMEM scratch so the per-disk loops can read dynamic
    # 8-aligned row BANDS (pallas_stamp.reduce_partials_banded - the
    # issue-bound loops' cost scales with rows evaluated per disk)
    eps_t = jax.lax.slice(sv[0], (1, _HX), (1 + th, _HX + tw))
    share_den = 1.0 / jnp.maximum(eps_t, eps_min)
    wscr[0] = jax.lax.slice(phi[0], (1, _HX), (1 + th, _HX + tw)) * share_den
    wscr[1] = jax.lax.slice(phi[1], (1, _HX), (1 + th, _HX + tw)) * share_den
    bh = band_height(cfg.window, th)
    for s in range(sub):
        x0f = (ix * tw + (s * 128 + ox)).astype(jnp.float32)
        # _FUSED_REDUCE_ILP: the reduce body is inlined `sub` times
        # here, and Mosaic compile time scales with the inlined
        # instruction count (full-tile ilp 8 pushed this kernel to ~8
        # min; banding halved both the vreg pressure and the inlined
        # instruction count, so re-A/B ilp when the band shape changes).
        part_ref[0, s] = reduce_partials_banded(
            lambda i, s=s: data_ref[0, s, i],
            cnt_ref[0, s, 0],
            iy * th + oy,
            x0f,
            wscr,
            s * 128,
            th,
            bh,
            cap,
            cfg,
            max_ilp=_reduce_ilp(),
        )


def fused_step_imb_reduce(
    f: jax.Array,
    eps: jax.Array,
    usx: jax.Array,
    usy: jax.Array,
    cfg: SimConfig,
    tile_data: jax.Array,
    counts: jax.Array,
    out_buf: jax.Array = None,
    prehalo=False,
    origin: Tuple[int, int] = (0, 0),
) -> Tuple[jax.Array, jax.Array]:
    """One coupled LBM step with the hydro force reduction fused in.

    tile_data/counts are the stamp binning (pallas_stamp, (n_tiles, 1,
    cap*8) / (n_tiles, 1, 1) at 128-column stamp-tile granularity).
    Returns (f_new, partials (n_tiles*cap, 4)); feed the partials to
    pallas_stamp.gather_partials.

    prehalo (True = 'y' / "yx"): multi-chip shards — cfg is the LOCAL
    config, f carries 2*hy exchanged halo rows (+ 2*_HX cols in "yx"),
    the solid stack carries 2*_HY rows (+ 2*_HX cols), tile_data/counts
    are the INTERIOR-tile rows of the canvas binning (the caller slices
    them out; disk coords stay in canvas frame via `origin`), and
    global-edge bounce-back is the caller's job
    (parallel/_pallas_step.py).

    origin = (oy, ox): static cell offsets of the interior frame inside
    the coordinate frame the binned disk data was gathered in (the
    sharded caller's stamp canvas). (0, 0) single-chip.

    out_buf: dead buffer of the OUTPUT shape (9, cfg.ny, cfg.nx) donated
    for the result (see fused_step_fluid - avoids XLA's 1.2 GB
    while-carry copy per step).
    """
    from lbmdem_tpu.ops.imb import _EPS_MIN

    fdt, hy, shift = _storage(cfg)
    assert f.dtype == fdt
    th, tw = tile_dims(cfg, wide=True, coupled=True)
    sub = tw // 128
    nty, ntx = cfg.ny // th, cfg.nx // tw
    n_tiles, one_, cap8 = tile_data.shape
    cap = cap8 // 8
    assert one_ == 1 and n_tiles == nty * ntx * sub
    assert f.shape[1] == cfg.ny + (2 * hy if prehalo else 0)
    assert f.shape[2] == cfg.nx + (2 * _HX if prehalo == "yx" else 0)
    s_shape = (3, cfg.ny + (2 * _HY if prehalo else 0),
               cfg.nx + (2 * _HX if prehalo == "yx" else 0))
    if usx is None:  # eps IS the stacked (3, ...) solid fields
        solid = eps
        assert solid.shape == s_shape, (solid.shape, s_shape)
    else:
        solid = jnp.stack(
            [eps.astype(jnp.float32), usx.astype(jnp.float32),
             usy.astype(jnp.float32)]
        )
        assert solid.shape == s_shape
    # stamp tile t_s = iy*ntx_s + ix*sub + s  <->  grid block (iy, ix)
    # sub-row s: reshaping to (nty*ntx, sub, ...) keeps slot numbering
    # (t_s*cap + rank) identical to the standalone reduce kernel's.
    data3 = tile_data.reshape(nty * ntx, sub, cap8)
    cnt3 = counts.reshape(nty * ntx, sub, 1)
    kernel = functools.partial(
        _imb_reduce_kernel, cfg=cfg, th=th, tw=tw, cap=cap,
        eps_min=_EPS_MIN, sub=sub, hy=hy, shift=shift, prehalo=prehalo,
        oy=origin[0], ox=origin[1],
    )
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(
            (1, sub, cap8), lambda i, j: (i * ntx + j, 0, 0),
            memory_space=pltpu.SMEM,
        ),
        pl.BlockSpec(
            (1, sub, 1), lambda i, j: (i * ntx + j, 0, 0),
            memory_space=pltpu.SMEM,
        ),
    ]
    operands = [f, solid, data3, cnt3]
    aliases = {}
    if out_buf is not None:
        assert out_buf.shape == (9, cfg.ny, cfg.nx)
        operands.append(out_buf)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        aliases = {4: 0}
        inner = kernel
        kernel = (lambda f_hbm, s_hbm, dref, cref, dead, *rest:
                  inner(f_hbm, s_hbm, dref, cref, *rest))
    fnew, partials = pl.pallas_call(
        kernel,
        grid=(nty, ntx),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((9, th, tw), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sub, cap, 4), lambda i, j: (i * ntx + j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((9, cfg.ny, cfg.nx), fdt),
            jax.ShapeDtypeStruct((nty * ntx, sub, cap, 4), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 9, th + 2 * hy, tw + 2 * _HX), fdt),
            pltpu.VMEM((2, 3, th + 2 * _HY, tw + 2 * _HX), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 9)),
            pltpu.SemaphoreType.DMA((2, 9)),
            pltpu.VMEM((2, th, tw), jnp.float32),  # banded-reduce wx/wy
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # tw=1024 windows need ~20 MB scoped VMEM (> the 16 MB
            # default); well under the 128 MB/core physical budget
            vmem_limit_bytes=_vmem_limit(118),
        ),
        input_output_aliases=aliases,
        interpret=_interpret(),
    )(*operands)
    return fnew, partials.reshape(nty * ntx * sub * cap, 4)


def _imb_reduce_multi_kernel(
    f_hbm, s_hbm, data_ref, cnt_ref, out_ref, part_ref, win, swin, sems,
    ssems, wscr, *, cfg: SimConfig, th: int, tw: int, cap: int,
    eps_min: float, sub: int, k: int, hy: int = _HY, shift: float = 0.0,
    prehalo=False, oy: int = 0, ox: int = 0, edge_ref=None,
    ny_glob: int = 0,
):
    """k coupled LBM steps per HBM round-trip over FROZEN solid fields,
    with the hydro force reduction run per INNER step (coupling-cadence
    temporal blocking for DYNAMIC scenes; cfg.coupling_k).

    The validity argument is the static hoist's (the IMB collide is
    pointwise in the solid window, which holds true values everywhere;
    only f's streaming consumes the k <= hy dependency cone) plus one
    physics approximation the caller owns: eps/us are the WINDOW-START
    disk fields, so the geometry the fluid sees lags the DEM by up to
    k-1 steps (disks travel ~1e-3 cells/step; the stamp coverage is
    itself only ~1e-2-accurate per cell - measured deltas in
    docs/performance.md). The force reduce stays per inner step: phi at
    interior cells is pointwise in the pre-collide planes, valid
    through the whole cone, so the DEM gets a fresh force every step -
    only the geometry is frozen. share_den is hoisted (frozen eps)."""
    from lbmdem_tpu.ops.pallas_stamp import band_height, reduce_partials_banded

    iy = pl.program_id(0)
    ix = pl.program_id(1)
    nty = pl.num_programs(0)
    ntx = pl.num_programs(1)
    lin = iy * ntx + ix
    slot = jax.lax.rem(lin, jnp.int32(2))

    def copies_for(step_lin, s):
        y0, x0 = _tile_xy(step_lin, ntx, th, tw)
        return _window_copies(
            f_hbm, win.at[s], sems.at[s], y0, x0, th, tw, cfg.ny, cfg.nx,
            prehalo, hy=hy,
        ) + _window_copies(
            s_hbm, swin.at[s], ssems.at[s], y0, x0, th, tw, cfg.ny, cfg.nx,
            prehalo,
        )

    _pipeline_window(copies_for, lin, slot, nty * ntx)
    edges = oye = None
    if edge_ref is not None:
        edges = tuple(edge_ref[0, 0, j] != 0 for j in range(4))
        oye = edge_ref[0, 0, 4]
    planes = [win[slot, i] for i in range(9)]
    if planes[0].dtype != jnp.float32:
        planes = [p.astype(jnp.float32) for p in planes]
    pad = hy - _HY  # bf16 f window is 8 rows taller per side (see static multi)
    sv = swin[slot]
    if pad:
        z = jnp.zeros((3, pad, tw + 2 * _HX), jnp.float32)
        sv = jnp.concatenate([z, sv, z], axis=1)
    eps_w, usx_w, usy_w = sv[0], sv[1], sv[2]
    eps_t = jax.lax.slice(eps_w, (hy, _HX), (hy + th, _HX + tw))
    share_den = 1.0 / jnp.maximum(eps_t, eps_min)
    bh = band_height(cfg.window, th)
    for t in range(k):
        fpost, phi = _collide_window(planes, cfg, eps=eps_w, usx=usx_w,
                                     usy=usy_w, shift=shift)
        wscr[0] = jax.lax.slice(
            phi[0], (hy, _HX), (hy + th, _HX + tw)) * share_den
        wscr[1] = jax.lax.slice(
            phi[1], (hy, _HX), (hy + th, _HX + tw)) * share_den
        for s in range(sub):
            x0f = (ix * tw + (s * 128 + ox)).astype(jnp.float32)
            part_ref[0, t * sub + s] = reduce_partials_banded(
                lambda i, s=s: data_ref[0, s, i],
                cnt_ref[0, s, 0],
                iy * th + oy,
                x0f,
                wscr,
                s * 128,
                th,
                bh,
                cap,
                cfg,
                max_ilp=_reduce_ilp(),
            )
        planes = _stream_and_bb_window(fpost, cfg, th, tw, iy, ix, nty,
                                       ntx, edges=edges, shift=shift,
                                       oy=oye, ny_glob=ny_glob or cfg.ny)
    out_ref[:] = jnp.stack(
        [jax.lax.slice(p, (hy, _HX), (hy + th, _HX + tw)) for p in planes]
    ).astype(out_ref.dtype)


def fused_step_imb_reduce_multi(
    f: jax.Array,
    solid: jax.Array,
    cfg: SimConfig,
    k: int,
    tile_data: jax.Array,
    counts: jax.Array,
    out_buf: jax.Array = None,
    prehalo=False,
    origin: Tuple[int, int] = (0, 0),
    edges: jax.Array = None,
    ny_glob: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """k coupled LBM steps + per-inner-step hydro reduction in ONE HBM
    round-trip (cfg.coupling_k temporal blocking for DYNAMIC coupled
    scenes - the dynamic sibling of fused_step_imb_static_multi).

    The solid stack (3, ny, nx) and the stamp binning are FROZEN for
    the window (built from window-start disk positions by the caller);
    the force reduce runs per inner step on that step's phi, so the
    k DEM applications each get a fresh force. Returns
    (f_new, partials (k, n_tiles*cap, 4)): feed partials[t] to
    pallas_stamp.gather_partials for inner step t's forces.

    prehalo/edges/ny_glob: multi-chip shards - ONE ppermute exchange
    feeds the k steps (as in fused_step_fluid_multi), and global-edge
    BB + Zou/He run in-kernel per inner step via the edge flags (the
    inner steps are invisible to the caller). origin = (oy, ox) offsets
    the reduce coordinates into the caller's stamp-canvas frame."""
    from lbmdem_tpu.ops.imb import _EPS_MIN

    fdt, hy, shift = _storage(cfg)
    assert f.dtype == fdt
    assert 1 <= k <= _HY, (
        f"coupled temporal block k={k} exceeds the {_HY}-row solid halo"
    )
    th, tw = tile_dims(cfg, wide=True, coupled=True)
    sub = tw // 128
    nty, ntx = cfg.ny // th, cfg.nx // tw
    n_tiles, one_, cap8 = tile_data.shape
    cap = cap8 // 8
    assert one_ == 1 and n_tiles == nty * ntx * sub
    assert f.shape[1] == cfg.ny + (2 * hy if prehalo else 0)
    assert f.shape[2] == cfg.nx + (2 * _HX if prehalo == "yx" else 0)
    s_shape = (3, cfg.ny + (2 * _HY if prehalo else 0),
               cfg.nx + (2 * _HX if prehalo == "yx" else 0))
    assert solid.shape == s_shape, (solid.shape, s_shape)
    assert (edges is not None) == bool(prehalo)
    data3 = tile_data.reshape(nty * ntx, sub, cap8)
    cnt3 = counts.reshape(nty * ntx, sub, 1)
    kernel = functools.partial(
        _imb_reduce_multi_kernel, cfg=cfg, th=th, tw=tw, cap=cap,
        eps_min=_EPS_MIN, sub=sub, k=k, hy=hy, shift=shift,
        prehalo=prehalo, oy=origin[0], ox=origin[1], ny_glob=ny_glob,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(
            (1, sub, cap8), lambda i, j: (i * ntx + j, 0, 0),
            memory_space=pltpu.SMEM,
        ),
        pl.BlockSpec(
            (1, sub, 1), lambda i, j: (i * ntx + j, 0, 0),
            memory_space=pltpu.SMEM,
        ),
    ]
    operands = [f, solid.astype(jnp.float32), data3, cnt3]
    if prehalo:
        e = edges.astype(jnp.int32).reshape(-1)
        e = jnp.concatenate([e, jnp.zeros((8 - e.shape[0],), jnp.int32)])
        operands.append(e.reshape(1, 1, 8))
        in_specs.append(
            pl.BlockSpec((1, 1, 8), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.SMEM)
        )
        inner_e = kernel
        kernel = (lambda f_hbm, s_hbm, dref, cref, eref, *rest:
                  inner_e(f_hbm, s_hbm, dref, cref, *rest, edge_ref=eref))
    aliases = {}
    if out_buf is not None:
        assert out_buf.shape == (9, cfg.ny, cfg.nx)
        di = len(operands)
        aliases = {di: 0}
        operands.append(out_buf)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        inner = kernel
        kernel = lambda *args, _i=inner, _d=di: _i(*args[:_d], *args[_d + 1:])
    fnew, partials = pl.pallas_call(
        kernel,
        grid=(nty, ntx),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((9, th, tw), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k * sub, cap, 4),
                         lambda i, j: (i * ntx + j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((9, cfg.ny, cfg.nx), fdt),
            jax.ShapeDtypeStruct((nty * ntx, k * sub, cap, 4), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 9, th + 2 * hy, tw + 2 * _HX), fdt),
            pltpu.VMEM((2, 3, th + 2 * _HY, tw + 2 * _HX), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 9)),
            pltpu.SemaphoreType.DMA((2, 9)),
            pltpu.VMEM((2, th, tw), jnp.float32),  # banded-reduce wx/wy
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_vmem_limit(118),
        ),
        input_output_aliases=aliases,
        interpret=_interpret(),
    )(*operands)
    # (n_tiles, k*sub, cap, 4) -> (k, n_tiles*sub*cap, 4): inner step t's
    # slab keeps the k=1 kernel's slot numbering (tile_s*cap + rank)
    partials = partials.reshape(nty * ntx, k, sub, cap, 4)
    partials = partials.transpose(1, 0, 2, 3, 4)
    return fnew, partials.reshape(k, nty * ntx * sub * cap, 4)


def _imb_kernel(
    f_hbm, s_hbm, out_ref, phi_ref, win, swin, sems, ssems, *,
    cfg: SimConfig, th: int, tw: int, prehalo: bool = False
):
    iy = pl.program_id(0)
    ix = pl.program_id(1)
    nty = pl.num_programs(0)
    ntx = pl.num_programs(1)
    lin = iy * ntx + ix
    slot = jax.lax.rem(lin, jnp.int32(2))

    def copies_for(step_lin, s):
        y0, x0 = _tile_xy(step_lin, ntx, th, tw)
        return _window_copies(
            f_hbm, win.at[s], sems.at[s], y0, x0, th, tw, cfg.ny, cfg.nx,
            prehalo,
        ) + _window_copies(
            s_hbm, swin.at[s], ssems.at[s], y0, x0, th, tw, cfg.ny, cfg.nx,
            prehalo,
        )

    _pipeline_window(copies_for, lin, slot, nty * ntx)
    wv = win[slot, :, _HY - 1 : _HY + th + 1, :]
    sv = swin[slot, :, _HY - 1 : _HY + th + 1, :]
    fpost, phi = _collide_window(wv, cfg, eps=sv[0], usx=sv[1], usy=sv[2])
    out_ref[:] = _stream_and_bb(fpost, cfg, th, tw, iy, ix, nty, ntx,
                                prehalo=prehalo)
    phi_ref[:] = jax.lax.slice(phi, (0, 1, _HX), (2, 1 + th, _HX + tw))


def fused_step_imb(
    f: jax.Array,
    eps: jax.Array,
    usx: jax.Array,
    usy: jax.Array,
    cfg: SimConfig,
    prehalo: bool = False,
    out_buf: jax.Array = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One coupled (Noble-Torczynski) LBM step as a fused Pallas kernel.

    Returns (f_new, phi_x, phi_y); stamping and force reduction are the
    particle-indexed kernels in ops/pallas_stamp.py. out_buf: dead
    f-output-shaped buffer donated for the result (see
    fused_step_fluid - avoids the while-carry copy).
    """
    assert f.dtype == jnp.float32, (
        "fused_step_imb is float32-only (bf16 storage runs through "
        "fused_step_imb_reduce on every path, incl. sharded)"
    )
    th, tw = tile_dims(cfg)
    assert f.shape[1] == cfg.ny + (2 * _HY if prehalo else 0)
    assert f.shape[2] == cfg.nx + (2 * _HX if prehalo == "yx" else 0)
    solid = jnp.stack(
        [eps.astype(jnp.float32), usx.astype(jnp.float32), usy.astype(jnp.float32)]
    )
    kernel = functools.partial(_imb_kernel, cfg=cfg, th=th, tw=tw,
                               prehalo=prehalo)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    operands = [f, solid]
    aliases = {}
    if out_buf is not None:
        assert out_buf.shape == (9, cfg.ny, cfg.nx)
        operands.append(out_buf)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        aliases = {2: 0}
        inner = kernel
        kernel = (lambda f_hbm, s_hbm, dead, *rest:
                  inner(f_hbm, s_hbm, *rest))
    fnew, phi = pl.pallas_call(
        kernel,
        grid=(cfg.ny // th, cfg.nx // tw),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((9, th, tw), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, th, tw), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((9, cfg.ny, cfg.nx), jnp.float32),
            jax.ShapeDtypeStruct((2, cfg.ny, cfg.nx), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 9, th + 2 * _HY, tw + 2 * _HX), jnp.float32),
            pltpu.VMEM((2, 3, th + 2 * _HY, tw + 2 * _HX), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 9)),
            pltpu.SemaphoreType.DMA((2, 9)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # headroom for the LBMDEM_TH/TW tile overrides
            vmem_limit_bytes=_vmem_limit(),
        ),
        input_output_aliases=aliases,
        interpret=_interpret(),
    )(*operands)
    return fnew, phi[0], phi[1]
