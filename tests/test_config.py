"""Parameter / particle file parsing (C18/C19)."""

import numpy as np
import pytest

from lbmdem_tpu.config import (
    SimConfig, load_param_file, load_particle_file, save_particle_file,
    window_for_radius,
)


def test_param_roundtrip(tmp_path):
    p = tmp_path / "run.par"
    p.write_text(
        """
        # channel with particles
        nx 128
        ny 64
        nu 0.1333333333333333
        gx 1e-6
        steps 1000
        out_interval 100
        bc west periodic
        bc east periodic
        bc south wall
        bc north wall
        kn 1.0
        gamma_n 0.1
        mu 0.3
        rho_s 2.5
        n_sub 20
        particles disks.txt
        dtype float64
        """
    )
    (tmp_path / "disks.txt").write_text("10 20 3.0\n30.5 20 3.0 0.1 -0.1 0.02\n")
    cfg, pf = load_param_file(str(p))
    assert (cfg.nx, cfg.ny) == (128, 64)
    assert abs(cfg.tau - 0.9) < 1e-12
    assert cfg.bc_south == "wall" and cfg.bc_west == "periodic"
    assert cfg.n_sub == 20 and cfg.rho_s == 2.5
    disks = load_particle_file(pf)
    assert len(disks) == 2
    assert disks[1].vx == 0.1 and disks[1].omega == 0.02


def test_particle_save_load(tmp_path):
    from lbmdem_tpu.config import DiskSpec
    disks = [DiskSpec(1, 2, 0.5, 0.1, 0.2, 0.3)]
    path = str(tmp_path / "d.txt")
    save_particle_file(path, disks)
    assert load_particle_file(path) == disks


def test_config_validation():
    with pytest.raises(ValueError):
        SimConfig(nx=4, ny=4, tau=0.4)
    with pytest.raises(ValueError):
        SimConfig(nx=4, ny=4, bc_west="periodic", bc_east="wall")
    with pytest.raises(ValueError):
        SimConfig(nx=4, ny=4, bc_south="slippery")


def test_window_covers_disk():
    for r in (0.8, 1.5, 3.2, 7.9):
        w = window_for_radius(r)
        # the window half-width must exceed r + sample slack
        assert w // 2 >= r + 0.5
        assert w % 2 == 1
