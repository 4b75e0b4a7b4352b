"""Headline benchmark: wall-clock per RK3 substep for a turbulent-channel LES
(static Smagorinsky + van Driest), the reference's production configuration
(BASELINE.md: channel LES Re_tau=550 class).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: ns per grid cell per RK3 substep (one substep = momentum RHS + RK
update + BC fills + Poisson solve + projection + SGS, main.f90:417-507).

vs_baseline: the reference publishes no benchmark tables (BASELINE.md); the
comparison constant below is our documented estimate of CaLES-on-A100 for this
configuration, 0.25 ns/cell/substep (a bandwidth-model estimate: ~45 full-field
HBM passes per substep at ~1.6 TB/s effective).  vs_baseline > 1 means faster
than that estimate.  Superseded by a measured number when one exists.
"""
import json
import os
import sys
import time

import numpy as np

BASELINE_NS_PER_CELL_SUBSTEP = 0.25


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from cales_tpu.config import Config
    from cales_tpu.grid import make_grid_from_config
    from cales_tpu.initflow import initflow
    from cales_tpu.timeloop import Simulation

    ng = (512, 256, 256)
    cfg = Config(ng=ng, l=(2 * np.pi, np.pi, 2.0), gtype=1, gr=1.0,
                 visci=20_000.0, inivel='log', is_wallturb=True,
                 is_forced=(True, False, False), velf=(1.0, 0.0, 0.0),
                 sgstype='smag', dtype='float32')
    grid = make_grid_from_config(cfg)
    sim = Simulation(cfg, grid)
    u, v, w, p = initflow(cfg, grid)
    state = sim.initial_state(u, v, w, p)
    dt = jnp.asarray(1e-4, dtype=state.u.dtype)

    # warmup / compile
    state, _ = sim.step(state, dt)
    jax.block_until_ready(state.u)

    nrep = 10
    t0 = time.perf_counter()
    for _ in range(nrep):
        state, _ = sim.step(state, dt)
    jax.block_until_ready(state.u)
    t1 = time.perf_counter()

    ncell = ng[0] * ng[1] * ng[2]
    ns_per_cell_substep = (t1 - t0) / nrep / 3.0 / ncell * 1e9
    out = {
        "metric": "channel LES (smag) ns/cell/RK3-substep, 512x256x256 f32",
        "value": round(ns_per_cell_substep, 4),
        "unit": "ns/cell/substep",
        "vs_baseline": round(BASELINE_NS_PER_CELL_SUBSTEP / ns_per_cell_substep, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
