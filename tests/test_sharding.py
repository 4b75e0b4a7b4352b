"""Decomposition invariance: the sharded step must reproduce the single-device
step (SURVEY §7.2 stage 10; the reference validates the same property across
MPI layouts, utils.f90:17-24 — tolerance-based because reductions reassociate)."""
import numpy as np
import jax
import pytest

from cales_tpu.config import Config
from cales_tpu.grid import make_grid_from_config
from cales_tpu.timeloop import Simulation
from cales_tpu.parallel.mesh import make_mesh, field_sharding

from test_sharding_paths import _perturbed


@pytest.mark.parametrize("dims", [(1, 8), (2, 4)])
def test_sharded_step_matches_single(dims):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = Config(ng=(32, 16, 16), l=(2 * np.pi, np.pi, 2.0), gtype=1, gr=1.0,
                 visci=1000.0, inivel='log', is_wallturb=True, dtype='float64',
                 is_forced=(True, False, False), velf=(1.0, 0.0, 0.0),
                 sgstype='smag')
    grid = make_grid_from_config(cfg)
    # seeded ASYMMETRIC ICs: symmetric startup flows can cancel ghost-row
    # bugs exactly (see _perturbed's docstring)
    u, v, w, p = _perturbed(cfg, grid)
    dt = 5e-3

    sim1 = Simulation(cfg, grid)
    s1 = sim1.initial_state(u, v, w, p)
    for _ in range(3):
        s1, _ = sim1.step(s1, dt)

    mesh = make_mesh(dims)
    simN = Simulation(cfg, grid, mesh=mesh)
    sN = simN.initial_state(u, v, w, p)
    sh = field_sharding(mesh)
    sN = sN._replace(u=jax.device_put(sN.u, sh), v=jax.device_put(sN.v, sh),
                     w=jax.device_put(sN.w, sh), p=jax.device_put(sN.p, sh),
                     visct=jax.device_put(sN.visct, sh))
    for _ in range(3):
        sN, _ = simN.step(sN, dt)

    for a, b, name in ((s1.u, sN.u, 'u'), (s1.v, sN.v, 'v'),
                       (s1.w, sN.w, 'w'), (s1.p, sN.p, 'p'),
                       (s1.visct, sN.visct, 'visct')):
        a, b = np.asarray(a), np.asarray(b)
        if name == 'p':
            # pressure gauge: the singular (all-N/P) Poisson solve pins the
            # constant mode arbitrarily, and the pinned value depends on the
            # reduction layout; physics only sees grad(p)
            a, b = a - a.mean(), b - b.mean()
        err = np.abs(a - b).max()
        assert err < 1e-11, f"{name} mismatch across decomposition: {err}"
