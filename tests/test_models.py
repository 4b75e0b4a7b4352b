"""Every canonical case builder must validate and take steps without blowup."""
import numpy as np
import pytest

from cales_tpu import models
from cales_tpu.config import validate
from cales_tpu.grid import make_grid_from_config
from cales_tpu.initflow import initflow
from cales_tpu.timeloop import Simulation

BUILDERS = [
    models.triperiodic_dns, models.taylor_green_2d, models.taylor_green_3d,
    models.channel_dns, models.channel_les, models.channel_wmles,
    models.half_channel, models.couette, models.lid_driven_cavity,
    models.square_duct_les, models.temporal_boundary_layer,
    models.developing_channel,
]


@pytest.mark.parametrize("builder", BUILDERS, ids=lambda b: b.__name__)
def test_case_validates(builder):
    validate(builder())


@pytest.mark.parametrize("builder", [
    models.taylor_green_3d, models.half_channel, models.lid_driven_cavity,
    models.square_duct_les, models.temporal_boundary_layer, models.couette,
    models.developing_channel,
], ids=lambda b: b.__name__)
def test_case_steps(builder):
    cfg = builder(ng=(12, 10, 12), dtype='float64')
    validate(cfg)
    grid = make_grid_from_config(cfg)
    sim = Simulation(cfg, grid)
    state = sim.initial_state(*initflow(cfg, grid))
    dt = min(sim.pick_dt(sim.check(state)[0]), 1e-2)
    for _ in range(3):
        state, _ = sim.step(state, dt)
    _, _, divmax = sim.check(state)
    assert divmax < 1e-10
    assert np.isfinite(np.asarray(state.u)).all()
