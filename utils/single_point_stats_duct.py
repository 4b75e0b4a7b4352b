#!/usr/bin/env python3
"""Time-average the per-snapshot duct cross-section statistics.

Counterpart of /root/reference/utils/single-point-stats-duct.py: reads the
``stats2d_*.out`` files written at the iout1d cadence for duct-class cases
(io/stats.duct_stats_2d: ``y z um vm wm uu vv ww vw`` columns), averages
over snapshots, and writes the (y, z) mean cross-section table plus the
wall-friction summary from the near-wall gradients.  N.B. the bottom-wall
u_tau estimate averages the first off-wall um row across the FULL y extent
including sidewall-adjacent cells; restrict to the duct core for a
sidewall-free number.

Usage: python utils/single_point_stats_duct.py 'data/stats2d_*.out' --visc 1e-3
"""
import argparse
import glob

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('pattern', help="glob for stats2d files")
    ap.add_argument('--visc', type=float, required=True)
    ap.add_argument('--skip', type=int, default=0)
    ap.add_argument('--out', default='stats2d_avg.out')
    args = ap.parse_args()

    files = sorted(glob.glob(args.pattern))[args.skip:]
    if not files:
        raise SystemExit('no files match')
    acc = None
    header = open(files[0]).readline()
    for fn in files:
        d = np.loadtxt(fn)
        acc = d if acc is None else acc + d
    avg = acc / len(files)

    with open(args.out, 'w') as f:
        f.write(header if header.startswith('#') else '# y z stats...\n')
        f.write(f'# time-averaged over {len(files)} snapshots\n')
        for row in avg:
            f.write(' '.join(f'{v:16.7e}' for v in row) + '\n')

    # wall friction from the first off-wall u row (z walls; columns: y z u ...)
    y = avg[:, 0]
    z = avg[:, 1]
    u = avg[:, 2]
    zmin_rows = np.isclose(z, z.min())
    dudz_w = u[zmin_rows].mean() / z.min()
    u_tau = np.sqrt(args.visc * abs(dudz_w))
    print(f'averaged {len(files)} snapshots -> {args.out}')
    print(f'bottom-wall u_tau ~= {u_tau:.6e} (one-sided first-point gradient)')


if __name__ == '__main__':
    main()
