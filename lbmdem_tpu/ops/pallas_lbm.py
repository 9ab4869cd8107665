"""Fused Pallas TPU kernels for the LBM hot loop (SURVEY.md SS7 stage 5).

One kernel pass per step fuses: macroscopic moments -> (NT-blended) BGK
collision (+ Guo forcing) -> pull streaming -> half-way bounce-back,
and for the coupled path also emits the per-cell momentum-exchange
field. This replaces the collide/stream kernel pair of the reference's
CUDA design (SURVEY SS3.2) with a single bandwidth-optimal sweep:
f is read once from HBM and written once.

Design:
- f lives in HBM as (9, ny, nx) float32, nx padded to lane multiples by
  the caller (config validation). The grid walks row strips of TH rows;
  each strip manually DMAs its (9, TH+2, nx) halo window (wrap-safe row
  indices) into VMEM - BlockSpecs cannot express overlapping windows,
  DMA can (pallas_guide "Async DMA").
- In-strip x-neighbors use lane rolls (`pltpu.roll`), which IS the
  periodic x wrap; wall columns are overwritten by the in-kernel
  bounce-back, so the wrapped values never survive (same invariant as
  the jnp.roll oracle in ops/lbm.py).
- y-halo rows wrap modulo ny: correct for periodic y; for wall y the
  wrapped rows only feed populations the bounce-back overwrites.
- Collision is computed on the TH+2 window (duplicating 2 rows of work
  per strip) so streaming needs no cross-strip state: ~2/TH overhead.

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

_INTERPRET = False  # flipped by tests on CPU


def _pick_strip(ny: int) -> int:
    """Largest strip height <= 64 dividing ny (minimizes halo recompute
    while keeping the VMEM window bounded)."""
    for th in (64, 32, 16, 8, 4, 2, 1):
        if ny % th == 0:
            return th
    return 1


def _collide_window(win, cfg: SimConfig, eps=None, usx=None, usy=None):
    """Moments + (NT-blended) BGK + Guo forcing on a (9, H, W) window.

    Returns (fpost, phi) where phi is None for pure fluid, else a
    (2, H, W) momentum-exchange field (force on solid per cell).
    """
    dt = win.dtype
    tau = cfg.tau
    w_c = lattice.W.astype(np.float32)
    ex_c = lattice.EX.astype(np.float32)
    ey_c = lattice.EY.astype(np.float32)
    gx, gy = cfg.gx, cfg.gy

    rho = win[0]
    jx = jnp.zeros_like(rho)
    jy = jnp.zeros_like(rho)
    for i in range(1, 9):
        rho = rho + win[i]
        if ex_c[i]:
            jx = jx + ex_c[i] * win[i]
        if ey_c[i]:
            jy = jy + ey_c[i] * win[i]
    inv_rho = 1.0 / rho
    ux = (jx + 0.5 * gx) * inv_rho
    uy = (jy + 0.5 * gy) * inv_rho
    usq = ux * ux + uy * uy

    def feq_i(i, ux_, uy_, usq_):
        eu = ex_c[i] * ux_ + ey_c[i] * uy_
        return w_c[i] * rho * (1.0 + 3.0 * eu + 4.5 * eu * eu - 1.5 * usq_)

    coupled = eps is not None
    if coupled:
        eps_c = jnp.clip(eps, 0.0, 1.0)
        tm = tau - 0.5
        B = eps_c * tm / ((1.0 - eps_c) + tm)
        one_minus_B = 1.0 - B
        usq_s = usx * usx + usy * usy
        phix = jnp.zeros_like(rho)
        phiy = jnp.zeros_like(rho)

    inv_tau = 1.0 / tau
    force_pref = (1.0 - 0.5 * inv_tau)
    outs = []
    for i in range(9):
        feq = feq_i(i, ux, uy, usq)
        if coupled:
            io = int(lattice.OPP[i])
            feq_s = feq_i(i, usx, usy, usq_s)
            feq_o = feq_i(io, ux, uy, usq)
            omega_s = win[io] - win[i] + feq_s - feq_o
            fp = win[i] - one_minus_B * (win[i] - feq) * inv_tau + B * omega_s
            if ex_c[i]:
                phix = phix - ex_c[i] * (B * omega_s)
            if ey_c[i]:
                phiy = phiy - ey_c[i] * (B * omega_s)
        else:
            fp = win[i] - (win[i] - feq) * inv_tau
        if gx != 0.0 or gy != 0.0:
            eu = ex_c[i] * ux + ey_c[i] * uy
            proj = 3.0 * ((ex_c[i] - ux) * gx + (ey_c[i] - uy) * gy) + 9.0 * eu * (
                ex_c[i] * gx + ey_c[i] * gy
            )
            src = w_c[i] * force_pref * proj
            fp = fp + (one_minus_B * src if coupled else src)
        outs.append(fp)
    phi = jnp.stack([phix, phiy]) if coupled else None
    return outs, phi


def _stream_and_bb(fpost, cfg: SimConfig, th: int, step, n_steps: int):
    """Pull-stream a list of 9 (TH+2, W) post-collision planes into the
    (9, TH, W) output block, applying bounce-back at global walls."""
    nx = cfg.nx
    outs = []
    for i in range(9):
        ex, ey = int(lattice.E[i, 0]), int(lattice.E[i, 1])
        plane = fpost[i]
        if ex:
            # pltpu.roll requires non-negative shifts; ex in {-1, +1}
            plane = pltpu.roll(plane, ex % nx, 1)  # lane roll = periodic x
        outs.append(jax.lax.slice_in_dim(plane, 1 - ey, 1 - ey + th, axis=0))

    # x walls: every strip, fixed columns.
    col = jax.lax.broadcasted_iota(jnp.int32, (th, nx), 1)
    if cfg.bc_west == WALL:
        at_w = col == 0
        for i in (int(j) for j in lattice.IN_E):
            io = int(lattice.OPP[i])
            outs[i] = jnp.where(
                at_w, jax.lax.slice_in_dim(fpost[io], 1, 1 + th, axis=0), outs[i]
            )
    if cfg.bc_east == WALL:
        at_e = col == nx - 1
        for i in (int(j) for j in lattice.IN_W):
            io = int(lattice.OPP[i])
            outs[i] = jnp.where(
                at_e, jax.lax.slice_in_dim(fpost[io], 1, 1 + th, axis=0), outs[i]
            )

    # y walls: only the first/last strip, fixed rows.
    row = jax.lax.broadcasted_iota(jnp.int32, (th, nx), 0)
    if cfg.bc_south == WALL:
        at_s = (row == 0) & (step == 0)
        for i in (int(j) for j in lattice.IN_N):
            io = int(lattice.OPP[i])
            outs[i] = jnp.where(
                at_s, jax.lax.slice_in_dim(fpost[io], 1, 1 + th, axis=0), outs[i]
            )
    if cfg.bc_north == WALL:
        at_n = (row == th - 1) & (step == n_steps - 1)
        for i in (int(j) for j in lattice.IN_S):
            io = int(lattice.OPP[i])
            outs[i] = jnp.where(
                at_n, jax.lax.slice_in_dim(fpost[io], 1, 1 + th, axis=0), outs[i]
            )
    return jnp.stack(outs)


def _fluid_kernel(f_hbm, out_ref, win, sem, *, cfg: SimConfig, th: int):
    ny = cfg.ny
    n_steps = pl.num_programs(0)
    step = pl.program_id(0)
    y0 = step * th

    ny32 = jnp.int32(ny)
    top = jax.lax.rem(y0 - 1 + ny32, ny32)
    bot = jax.lax.rem(y0 + th, ny32)
    c_top = pltpu.make_async_copy(
        f_hbm.at[:, pl.ds(top, 1), :], win.at[:, 0:1, :], sem.at[0]
    )
    c_mid = pltpu.make_async_copy(
        f_hbm.at[:, pl.ds(y0, th), :], win.at[:, 1 : th + 1, :], sem.at[1]
    )
    c_bot = pltpu.make_async_copy(
        f_hbm.at[:, pl.ds(bot, 1), :], win.at[:, th + 1 : th + 2, :], sem.at[2]
    )
    c_top.start()
    c_mid.start()
    c_bot.start()
    c_top.wait()
    c_mid.wait()
    c_bot.wait()

    fpost, _ = _collide_window(win[:], cfg)
    out_ref[:] = _stream_and_bb(fpost, cfg, th, step, n_steps)


def fused_step_fluid(f: jax.Array, cfg: SimConfig) -> jax.Array:
    """One pure-fluid LBM step as a single fused Pallas kernel."""
    assert f.dtype == jnp.float32, "Pallas path is float32 (use_pallas=False for f64)"
    th = _pick_strip(cfg.ny)
    grid = (cfg.ny // th,)
    kernel = functools.partial(_fluid_kernel, cfg=cfg, th=th)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (9, th, cfg.nx), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((9, cfg.ny, cfg.nx), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((9, th + 2, cfg.nx), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_INTERPRET,
    )(f)


def _imb_kernel(f_hbm, s_hbm, out_ref, phi_ref, win, swin, sem, *, cfg: SimConfig, th: int):
    ny = cfg.ny
    n_steps = pl.num_programs(0)
    step = pl.program_id(0)
    y0 = step * th

    ny32 = jnp.int32(ny)
    top = jax.lax.rem(y0 - 1 + ny32, ny32)
    bot = jax.lax.rem(y0 + th, ny32)
    copies = [
        pltpu.make_async_copy(f_hbm.at[:, pl.ds(top, 1), :], win.at[:, 0:1, :], sem.at[0]),
        pltpu.make_async_copy(f_hbm.at[:, pl.ds(y0, th), :], win.at[:, 1 : th + 1, :], sem.at[1]),
        pltpu.make_async_copy(f_hbm.at[:, pl.ds(bot, 1), :], win.at[:, th + 1 : th + 2, :], sem.at[2]),
        pltpu.make_async_copy(s_hbm.at[:, pl.ds(top, 1), :], swin.at[:, 0:1, :], sem.at[3]),
        pltpu.make_async_copy(s_hbm.at[:, pl.ds(y0, th), :], swin.at[:, 1 : th + 1, :], sem.at[4]),
        pltpu.make_async_copy(s_hbm.at[:, pl.ds(bot, 1), :], swin.at[:, th + 1 : th + 2, :], sem.at[5]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    fpost, phi = _collide_window(
        win[:], cfg, eps=swin[0], usx=swin[1], usy=swin[2]
    )
    out_ref[:] = _stream_and_bb(fpost, cfg, th, step, n_steps)
    # phi for the strip's own rows (window rows 1..TH)
    phi_ref[:] = jax.lax.slice_in_dim(phi, 1, 1 + th, axis=1)


def fused_step_imb(
    f: jax.Array,
    eps: jax.Array,
    usx: jax.Array,
    usy: jax.Array,
    cfg: SimConfig,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One coupled (Noble-Torczynski) LBM step as a fused Pallas kernel.

    Returns (f_new, phi_x, phi_y); stamping and force reduction stay
    outside (they are particle-indexed, not lattice sweeps).
    """
    assert f.dtype == jnp.float32
    th = _pick_strip(cfg.ny)
    grid = (cfg.ny // th,)
    solid = jnp.stack([eps.astype(jnp.float32), usx.astype(jnp.float32),
                       usy.astype(jnp.float32)])
    kernel = functools.partial(_imb_kernel, cfg=cfg, th=th)
    fnew, phi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec((9, th, cfg.nx), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, th, cfg.nx), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((9, cfg.ny, cfg.nx), jnp.float32),
            jax.ShapeDtypeStruct((2, cfg.ny, cfg.nx), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((9, th + 2, cfg.nx), jnp.float32),
            pltpu.VMEM((3, th + 2, cfg.nx), jnp.float32),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_INTERPRET,
    )(f, solid)
    return fnew, phi[0], phi[1]
