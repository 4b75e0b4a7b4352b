"""Every shipped example must parse, validate, and take a few steps.

The example set mirrors the reference's examples/dns + examples/les
configurations (BC-combination coverage; each exercises a different path
through the BC layer, transform selection, and forcing logic).
"""
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


@pytest.mark.parametrize("nml", EXAMPLES, ids=lambda p: p.parent.name)
def test_example_steps(nml, tmp_path):
    """Each example advances 2 steps at reduced resolution with finite
    fields (the reference's de-facto acceptance: icheck divergence/NaN
    aborts would fire otherwise, main.f90:523-544)."""
    cfg = config_from_nml(str(nml), dtype='float64', ng=(16, 16, 16),
                          icheck=1)
    sim, state = run(cfg, datadir=tmp_path, max_steps=2, verbose=False)
    for f in (state.u, state.v, state.w, state.p):
        assert np.isfinite(np.asarray(f)).all()
    assert (tmp_path / 'grid.out').exists()
