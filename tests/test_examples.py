"""Every example deck parses, builds, and steps (SURVEY.md SS4: the five
BASELINE configs are the integration suite; decks are the user surface).
"""

import glob
import os

import numpy as np
import pytest

from lbmdem_tpu.config import load_param_file, load_particle_file
from lbmdem_tpu.simulation import Simulation

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")
DECKS = sorted(glob.glob(os.path.join(EXAMPLES, "*.par")))

# decks small enough to actually step on the CPU test runner; the
# column-collapse deck is the 4096^2 headline config (bench.py territory)
_STEP_CELL_CAP = 512 * 1024


def test_all_five_baseline_decks_present():
    names = {os.path.basename(p) for p in DECKS}
    assert {
        "poiseuille.par", "sedimentation.par", "dkt.par",
        "settling_column.par", "column_collapse.par",
    } <= names


@pytest.mark.parametrize("deck", DECKS, ids=os.path.basename)
def test_deck_parses_and_steps(deck):
    cfg, pfile = load_param_file(deck)
    disks = load_particle_file(pfile, units=cfg.units) if pfile else []
    if pfile:
        assert len(disks) > 0
        for d in disks:
            assert 0 <= d.x < cfg.nx and 0 <= d.y < cfg.ny and d.r > 0
    if cfg.nx * cfg.ny > _STEP_CELL_CAP:
        return  # parse/validate only (headline-size deck)
    sim = Simulation(cfg.replace(out_interval=2), disks)
    sim.run(2)
    assert int(sim.state.step) == 2
    assert int(sim.state.overflow) == 0
    assert np.isfinite(np.asarray(sim.state.f)).all()
