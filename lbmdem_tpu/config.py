"""Configuration: typed dataclasses + reference-style input files.

SURVEY.md SS2 C18 (parameter input) and C19 (particle input). The
reference is driven by a keyword text parameter file plus a particle
list file; we keep that style (one `key value...` pair per line, `#`
comments) so reference decks port mechanically, and layer a typed
`SimConfig` on top. All shape-determining fields are static Python ints
so the whole step loop jit-compiles with fixed shapes.

Parameter keywords (reference-format; SURVEY C18 lists the set):
    nx, ny                lattice size
    tau                   BGK relaxation time (or `nu` in lattice units)
    gx, gy                fluid body force / gravity (lattice units)
    steps                 number of LBM steps
    out_interval          snapshot interval (0 = never)
    particles <path>      particle input file
    kn, kt                contact normal/tangential spring stiffness
    gamma_n, gamma_t      contact normal/tangential damping
    mu                    Coulomb friction coefficient
    rho_s                 solid density (lattice units; fluid rho0 = 1)
    n_sub                 DEM substeps per LBM step
    bc <side> <type>      side in {west,east,south,north}, type in
                          {wall, periodic}
    g_px, g_py            gravity acting on particles (lattice units)
    buoyancy [0|1]        add analytic buoyancy -rho_f*V*g to disks
    smagorinsky <Cs>      LES constant (0 disables; SURVEY C8)
    eps_samples <n>       n x n subgrid samples per cell for the solid
                          fraction (SURVEY C9)
    dtype float32|float64

Particle file: one disk per line, `x y r [vx vy omega]` in lattice units.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import numpy as np

WALL = "wall"
PERIODIC = "periodic"
_SIDES = ("west", "east", "south", "north")


@dataclasses.dataclass(frozen=True)
class DiskSpec:
    """Initial condition of one DEM disk (lattice units)."""

    x: float
    y: float
    r: float
    vx: float = 0.0
    vy: float = 0.0
    omega: float = 0.0


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Full static configuration of a simulation (all lattice units)."""

    nx: int
    ny: int
    tau: float = 1.0
    # Fluid body force (e.g. channel driving; gravity acting on the fluid).
    gx: float = 0.0
    gy: float = 0.0
    steps: int = 0
    out_interval: int = 0
    # Boundary conditions per side: "wall" (half-way bounce-back) or
    # "periodic".
    bc_west: str = PERIODIC
    bc_east: str = PERIODIC
    bc_south: str = WALL
    bc_north: str = WALL
    # --- DEM / coupling ---
    max_disks: int = 0  # static capacity; >= number of actual disks
    rho_s: float = 2.0
    kn: float = 1.0
    kt: float = 0.0
    gamma_n: float = 0.0
    gamma_t: float = 0.0
    mu: float = 0.0
    n_sub: int = 10
    # Gravity acting on disks; with `buoyancy`, the analytic Archimedes
    # force -rho_f * V * g is added (fluid itself usually unforced then).
    g_px: float = 0.0
    g_py: float = 0.0
    buoyancy: bool = True
    # Max simultaneous near-contacts per disk (pruned Verlet list slots;
    # hex-packing coordination is 6 - overflow is counted, never dropped).
    contact_cap: int = 10
    # Solid-fraction stamping: subgrid sample count per axis, and the
    # static per-disk stamp window (cells per axis). window=0 -> derived
    # from max radius at scene build time. eps_method "sample" uses
    # eps_samples^2 subgrid points (reference-style); "ramp" uses the
    # linear diffuse-interface approximation clip(r + 1/2 - d, 0, 1).
    eps_samples: int = 4
    eps_method: str = "sample"
    window: int = 0
    # Per-tile disk capacity for the Pallas stamp/reduce kernels
    # (0 = derived from disk radii at scene build time).
    tile_cap: int = 0
    # Smagorinsky LES constant (0 = plain BGK).
    smagorinsky: float = 0.0
    # Numerics
    dtype: str = "float32"
    # Initial fluid density / velocity.
    rho0: float = 1.0
    u0x: float = 0.0
    u0y: float = 0.0
    # Tangential wall speeds (moving-wall bounce-back, e.g. lid-driven
    # cavity): west/east walls move along y, south/north along x.
    uw_west: float = 0.0
    uw_east: float = 0.0
    uw_south: float = 0.0
    uw_north: float = 0.0

    def __post_init__(self):
        for s in (self.bc_west, self.bc_east, self.bc_south, self.bc_north):
            if s not in (WALL, PERIODIC):
                raise ValueError(f"bad bc {s!r}: want {WALL!r} or {PERIODIC!r}")
        if self.bc_west == PERIODIC and self.bc_east != PERIODIC:
            raise ValueError("periodic bc must pair: west/east")
        if self.bc_south == PERIODIC and self.bc_north != PERIODIC:
            raise ValueError("periodic bc must pair: south/north")
        if self.tau <= 0.5:
            raise ValueError(f"tau must exceed 0.5 (got {self.tau})")

    @property
    def nu(self) -> float:
        return (self.tau - 0.5) / 3.0

    @property
    def np_dtype(self):
        return np.dtype(self.dtype)

    def replace(self, **kw) -> "SimConfig":
        return dataclasses.replace(self, **kw)


def window_for_radius(r_max: float) -> int:
    """Static stamp window (cells/axis) that fully covers a disk of radius
    r_max from the cell nearest its center: need cells with center
    distance <= r_max + half-cell diagonal, plus one cell of slack for
    subgrid samples."""
    return 2 * (int(math.ceil(r_max + 0.5)) + 1) + 1


def load_param_file(path: str) -> Tuple[SimConfig, Optional[str]]:
    """Parse a reference-style keyword parameter file.

    Returns (config, particle_file_path_or_None). The particle file path
    is resolved relative to the parameter file's directory.
    """
    import os

    kw = {}
    bc = {}
    particles = None
    with open(path) as fh:
        for raw in fh:
            line = raw.split("#", 1)[0].strip()
            if not line:
                continue
            parts = line.split()
            key, vals = parts[0].lower(), parts[1:]
            if key == "bc":
                if len(vals) != 2 or vals[0] not in _SIDES:
                    raise ValueError(f"bad bc line: {raw!r}")
                bc[f"bc_{vals[0]}"] = vals[1]
            elif key == "particles":
                particles = os.path.join(os.path.dirname(os.path.abspath(path)), vals[0])
            elif key == "nu":
                kw["tau"] = 3.0 * float(vals[0]) + 0.5
            elif key == "dtype":
                kw["dtype"] = vals[0]
            elif key in ("nx", "ny", "steps", "out_interval", "n_sub",
                         "eps_samples", "window", "max_disks"):
                kw[key] = int(float(vals[0]))
            elif key == "buoyancy":
                kw[key] = bool(int(vals[0]))
            elif key in ("tau", "gx", "gy", "kn", "kt", "gamma_n", "gamma_t",
                         "mu", "rho_s", "g_px", "g_py", "smagorinsky",
                         "rho0", "u0x", "u0y", "uw_west", "uw_east",
                         "uw_south", "uw_north"):
                kw[key] = float(vals[0])
            else:
                raise ValueError(f"unknown parameter keyword {key!r}")
    return SimConfig(**kw, **bc), particles


def load_particle_file(path: str) -> list[DiskSpec]:
    """Parse a particle list file: `x y r [vx vy omega]` per line."""
    disks = []
    with open(path) as fh:
        for raw in fh:
            line = raw.split("#", 1)[0].strip()
            if not line:
                continue
            v = [float(t) for t in line.split()]
            if len(v) not in (3, 6):
                raise ValueError(f"bad particle line: {raw!r}")
            disks.append(DiskSpec(*v))
    return disks


def save_particle_file(path: str, disks: Sequence[DiskSpec]) -> None:
    with open(path, "w") as fh:
        fh.write("# x y r vx vy omega\n")
        for d in disks:
            fh.write(f"{d.x} {d.y} {d.r} {d.vx} {d.vy} {d.omega}\n")
