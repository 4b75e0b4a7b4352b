"""Every shipped example must parse, validate, and take a first step."""
from pathlib import Path

import numpy as np
import pytest

from cales_tpu.nml import config_from_nml
from cales_tpu.config import validate
from cales_tpu.driver import run

EXAMPLES = sorted(Path(__file__).resolve().parents[1].glob('examples/*/input.nml'))


@pytest.mark.parametrize("nml", EXAMPLES, ids=lambda p: p.parent.name)
def test_example_validates(nml):
    cfg = config_from_nml(str(nml))
    validate(cfg)


def test_example_runs_one_step(tmp_path):
    nml = [p for p in EXAMPLES if p.parent.name == 'taylor_green_vortex_2d'][0]
    cfg = config_from_nml(str(nml), dtype='float64', ng=(16, 16, 4))
    sim, state = run(cfg, datadir=tmp_path, max_steps=2, verbose=False)
    assert np.isfinite(np.asarray(state.u)).all()
    assert (tmp_path / 'grid.out').exists()
