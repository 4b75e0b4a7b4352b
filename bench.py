"""Headline benchmark: wall-clock per RK3 substep for a turbulent-channel LES
(static Smagorinsky + van Driest), the reference's production configuration
(BASELINE.md: channel LES Re_tau=550 class).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology: N time steps run inside ONE device program
(Simulation.multi_step, a lax.fori_loop over the full RK3 step), timed from
dispatch to a forced scalar fetch of the result — robust to the async
dispatch semantics of the runtime.  A 1-step run is timed the same way and
subtracted to remove fixed dispatch/fetch overhead.

Metric: ns per grid cell per RK3 substep (one substep = momentum RHS + RK
update + BC fills + FFT/tridiagonal Poisson solve + projection + SGS,
reference main.f90:417-507).

vs_baseline: the reference publishes no benchmark tables (BASELINE.md); the
constant below is our documented estimate of CaLES-on-A100 for this class of
configuration, 0.25 ns/cell/substep (bandwidth model: ~45 full-field HBM
passes per substep at ~1.55 TB/s effective).  vs_baseline > 1 means faster
than that estimate; superseded by a measured number when one exists.

Multi-chip: ``python bench.py --mesh 2x4 [--ng 1024x512x512]`` runs the same
benchmark sharded over a ('gy','gx') device mesh — the BASELINE.json
north-star configuration on a v5e-8.  Requires gy*gx attached devices.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

BASELINE_NS_PER_CELL_SUBSTEP = 0.25
NG = (512, 256, 256)
NSTEPS = 10


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--mesh', default=None,
                    help="device mesh as GYxGX (e.g. 2x4); default single-chip")
    ap.add_argument('--ng', default=None,
                    help="grid as NXxNYxNZ; default 512x256x256 "
                         "(1024x512x512 with --mesh 2x4)")
    ap.add_argument('--nsteps', type=int, default=NSTEPS)
    args = ap.parse_args(argv)
    if args.nsteps < 2:
        ap.error('--nsteps must be >= 2 (a 1-step run is the overhead probe)')

    import jax
    import jax.numpy as jnp

    # persistent executable cache: the Pallas mega-kernels take ~2 min of
    # Mosaic compile per shape on first use; cached across runs
    jax.config.update('jax_compilation_cache_dir',
                      os.path.expanduser('~/.jax_cache'))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from cales_tpu.config import Config
    from cales_tpu.grid import make_grid_from_config
    from cales_tpu.initflow import initflow
    from cales_tpu.timeloop import Simulation

    mesh = None
    if args.mesh:
        from cales_tpu.parallel.mesh import make_mesh
        dims = tuple(int(v) for v in args.mesh.split('x'))
        mesh = make_mesh(dims)
    ng = NG
    if args.ng:
        ng = tuple(int(v) for v in args.ng.split('x'))
    elif mesh is not None:
        ng = (1024, 512, 512)  # BASELINE.json north star on 8 chips

    # ptransform='mat' == the TPU 'auto' resolution; set explicitly so CPU
    # smoke runs of the sharded path skip an XLA-CPU rfft+GSPMD bug
    cfg = Config(ng=ng, l=(2 * np.pi, np.pi, 2.0), gtype=1, gr=1.0,
                 visci=20_000.0, inivel='log', is_wallturb=True,
                 is_forced=(True, False, False), velf=(1.0, 0.0, 0.0),
                 sgstype='smag', dtype='float32', ptransform='mat')
    grid = make_grid_from_config(cfg)
    sim = Simulation(cfg, grid, mesh=mesh)
    u, v, w, p = initflow(cfg, grid)
    state = sim.initial_state(u, v, w, p)
    if mesh is not None:
        from cales_tpu.parallel.mesh import field_sharding
        sh = field_sharding(mesh)
        state = state._replace(
            u=jax.device_put(state.u, sh), v=jax.device_put(state.v, sh),
            w=jax.device_put(state.w, sh), p=jax.device_put(state.p, sh),
            visct=jax.device_put(state.visct, sh))
    dt = 1e-4
    nsteps = args.nsteps

    def timed_advance(st, n):
        # multi_step donates its input state; always use the returned state
        t0 = time.perf_counter()
        out = sim.multi_step(st, dt, n)
        # force full completion through the runtime (dispatch is async and
        # block_until_ready is unreliable on this runtime; see CLAUDE.md)
        chk = float(jnp.sum(out.u[0, 0, :8]))
        el = time.perf_counter() - t0
        assert np.isfinite(chk)
        return out, el

    # compile both step counts + warm the pipeline
    state, _ = timed_advance(state, 1)
    state, _ = timed_advance(state, nsteps)
    # measure
    state, t1 = timed_advance(state, 1)
    state, tN = timed_advance(state, nsteps)
    per_step = max((tN - t1) / (nsteps - 1), 1e-9)

    ncell = ng[0] * ng[1] * ng[2]
    ns_per_cell_substep = per_step / 3.0 / ncell * 1e9
    tag = f'{ng[0]}x{ng[1]}x{ng[2]} f32'
    if mesh is not None:
        tag += f', mesh {args.mesh}'
    out = {
        "metric": f"channel LES (smag) ns/cell/RK3-substep, {tag}",
        "value": round(ns_per_cell_substep, 4),
        "unit": "ns/cell/substep",
        "vs_baseline": round(BASELINE_NS_PER_CELL_SUBSTEP / ns_per_cell_substep, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
