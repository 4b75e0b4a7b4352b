"""AOT proof of the flagship sharded configuration (BASELINE.json north star:
1024x512x512 Re_tau=550-class channel LES on a v5e-8).

No 8-chip hardware is available here, so this tool does what can be proven
without it: lower and compile the FULL production step (3 RK substeps,
momentum + projection + Poisson transform stack + SGS) at the target shape
against an 8-device mesh, with the real (z, y:'gy', x:'gx') domain
decomposition — catching sharding/layout/memory explosions at compile time —
and report the compiler's per-device memory budget.

Run with:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/flagship_aot.py [--ng 1024x512x512] [--dims 2x4]

(the tool re-execs itself with those settings if the attached backend has
fewer than 8 devices, same contract as __graft_entry__.dryrun_multichip).

Reference equivalent: this case is the only one the A100 comparison is
defined on; the reference proves its decomposition by running initmpi +
cuDecomp autotuning at job start (initmpi.f90:94-139).
"""
import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def parse_triple(s, sep='x'):
    return tuple(int(v) for v in s.split(sep))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--ng', default='1024x512x512')
    ap.add_argument('--dims', default='2x4')
    ap.add_argument('--sgstype', default='smag')
    args = ap.parse_args(argv)
    dims = parse_triple(args.dims)
    n_dev = dims[0] * dims[1]

    import jax
    if os.environ.get('CALES_FLAGSHIP_CHILD') == '1':
        # env vars alone don't override the already-registered axon plugin;
        # the config call must land before backend initialization
        jax.config.update('jax_platforms', 'cpu')
    if len(jax.devices()) < n_dev:
        import subprocess
        env = dict(os.environ)
        env['CALES_FLAGSHIP_CHILD'] = '1'
        env['JAX_PLATFORMS'] = 'cpu'
        env['XLA_FLAGS'] = (env.get('XLA_FLAGS', '') +
                            f' --xla_force_host_platform_device_count={n_dev}').strip()
        env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
        rc = subprocess.run([sys.executable, os.path.abspath(__file__)]
                            + (argv if argv is not None else sys.argv[1:]),
                            env=env).returncode
        sys.exit(rc)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cales_tpu.config import Config
    from cales_tpu.grid import make_grid_from_config
    from cales_tpu.timeloop import Simulation, State
    from cales_tpu.parallel.mesh import make_mesh, field_spec

    ng = parse_triple(args.ng)
    nx, ny, nz = ng
    cfg = Config(ng=ng, l=(2 * np.pi, np.pi, 2.0), gtype=1, gr=1.0,
                 visci=20_000.0, inivel='log', is_wallturb=True,
                 is_forced=(True, False, False), velf=(1.0, 0.0, 0.0),
                 sgstype=args.sgstype, dsmag_avg='channel', dtype='float32',
                 # the TPU production transform path (all-matmul); 'auto'
                 # on this CPU-device proof would pick rfft, whose c64
                 # intermediates trip an XLA verifier bug under sharding
                 ptransform='mat')
    grid = make_grid_from_config(cfg)
    mesh = make_mesh(dims)
    sim = Simulation(cfg, grid, mesh=mesh)

    f32 = np.dtype('float32')
    fld = lambda: jax.ShapeDtypeStruct((nz, ny, nx), f32,
                                       sharding=NamedSharding(mesh, field_spec()))
    rep = lambda shape, dt=f32: jax.ShapeDtypeStruct(
        shape, dt, sharding=NamedSharding(mesh, P(*([None] * len(shape)))))
    state = State(
        u=fld(), v=fld(), w=fld(), p=fld(), visct=fld(),
        vlo=(rep((nz + 2, ny + 2)), rep((nz + 2, nx + 2)), rep((ny + 2, nx + 2))),
        rhs_old=(fld(), fld(), fld()),
        time=rep(()), istep=rep((), np.dtype('int32')))
    dt_aval = rep(())

    t0 = time.time()
    # donate the state, as the production multi_step loop does — the
    # compiler aliases input and output field buffers
    lowered = jax.jit(sim._step_impl, donate_argnums=0).lower(state, dt_aval)
    t_lower = time.time() - t0
    print(f'lowered in {t_lower:.1f}s')
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    print(f'compiled in {t_compile:.1f}s for {n_dev} devices, mesh {dims}')

    ma = compiled.memory_analysis()
    if ma is not None:
        gib = 1024 ** 3
        print(f'per-device memory (compiler analysis):')
        print(f'  arguments : {ma.argument_size_in_bytes / gib:.3f} GiB')
        print(f'  outputs   : {ma.output_size_in_bytes / gib:.3f} GiB')
        print(f'  temps     : {ma.temp_size_in_bytes / gib:.3f} GiB')
        print(f'  generated code: {ma.generated_code_size_in_bytes / gib:.3f} GiB')
        total = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                 + ma.temp_size_in_bytes)
        print(f'  total (args+out+temp): {total / gib:.3f} GiB '
              f'(v5e HBM: 16 GiB/chip)')
    cost = compiled.cost_analysis()
    if cost:
        flops = cost.get('flops')
        if flops:
            print(f'flops/step (per device): {flops / 1e9:.1f} GFLOP')
    print('FLAGSHIP_AOT_OK')


if __name__ == '__main__':
    main()
