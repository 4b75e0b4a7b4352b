#!/usr/bin/env python3
"""Capture + summarize a device profile of N time steps (development tool).

Usage: python tools/profile_step.py [--ng 256 128 128] [--steps 3] [--sgs smag]
Writes the raw trace under /tmp/jaxtrace and prints the per-op-category
device-time summary (see CLAUDE.md: fetch-based sync; axon dispatch is async).
"""
import argparse, collections, glob, gzip, json, re, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ng', type=int, nargs=3, default=[256, 128, 128])
    ap.add_argument('--steps', type=int, default=3)
    ap.add_argument('--sgs', default='smag')
    ap.add_argument('--flavor', default='channel',
                    choices=['channel', 'matrix'],
                    help="'matrix': --sgs selects a bench.py matrix config "
                         "name instead (e.g. duct_les_dsmag)")
    ap.add_argument('--out', default='/tmp/jaxtrace')
    args = ap.parse_args()

    import jax, jax.numpy as jnp
    from cales_tpu.config import Config
    from cales_tpu.grid import make_grid_from_config
    from cales_tpu.initflow import initflow
    from cales_tpu.timeloop import Simulation

    if args.flavor == 'matrix':
        import bench
        cfg = Config(**bench._matrix_configs(tuple(args.ng))[args.sgs])
    else:
        cfg = Config(ng=tuple(args.ng), l=(2*np.pi, np.pi, 2.0), gtype=1,
                     gr=1.0, visci=20000.0, inivel='log', is_wallturb=True,
                     is_forced=(True, False, False), velf=(1., 0., 0.),
                     sgstype=args.sgs, dtype='float32', ptransform='mat')
    grid = make_grid_from_config(cfg)
    sim = Simulation(cfg, grid)
    state = sim.initial_state(*initflow(cfg, grid))
    dt = 1e-4
    s = sim.multi_step(state, dt, args.steps)
    _ = float(jnp.sum(s.u[0, 0, :4]))
    jax.profiler.start_trace(args.out)
    s = sim.multi_step(s, dt, args.steps)
    _ = float(jnp.sum(s.u[0, 0, :4]))
    jax.profiler.stop_trace()

    path = sorted(glob.glob(f'{args.out}/plugins/profile/*/*.trace.json.gz'))[-1]
    with gzip.open(path) as f:
        tr = json.load(f)
    durs, cnt, byts = collections.Counter(), collections.Counter(), collections.Counter()
    for e in tr['traceEvents']:
        if e.get('ph') == 'X' and 'dur' in e:
            nm = e.get('name', '?')
            if nm.startswith('$') or nm.startswith('PjitFunction') or \
               'jit_' in nm or nm.startswith('while') or nm in (
                   'np.asarray(jax.Array)', 'DevicePut'):
                continue
            key = re.sub(r'\.\d+$', '', nm)
            durs[key] += e['dur']
            cnt[key] += 1
            byts[key] += int(e.get('args', {}).get('bytes_accessed', 0))
    tot = sum(durs.values())
    totb = sum(byts.values())
    print(f'total device time: {tot/1e3:.2f} ms / {args.steps} steps; '
          f'bytes: {totb/1e9:.2f} GB '
          f'({totb/1e9/(tot/1e6+1e-12):.0f} GB/s avg)')
    for name, d in durs.most_common(15):
        print(f'{d/1e3:9.3f} ms x{cnt[name]:4d} {byts[name]/1e9:6.2f} GB  {name[:70]}')


if __name__ == '__main__':
    main()
