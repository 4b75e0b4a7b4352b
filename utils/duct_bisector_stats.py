#!/usr/bin/env python3
"""Extract wall-bisector (centerline) and corner-diagonal profiles from the
time-averaged duct cross-section statistics.

Counterpart of /root/reference/utils/single-point-stats-duct-piros.py, which
slices the averaged (z, y) duct statistics table along the wall bisector
(the row through the duct center) and the corner diagonal, for comparison
with Pirozzoli et al.'s duct data.  This version reads the averaged table
produced by utils/single_point_stats_duct.py (columns ``y z um vm wm uu vv
ww vw``, one row per (y, z) cell, z-major) and writes:

    stats-duct-centerline.out : profiles along y at the z midplane
    stats-duct-diagonal.out   : profiles along the y==z corner diagonal

Usage: python utils/duct_bisector_stats.py stats2d_avg.out [--out-prefix p]
"""
import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('table', help='averaged stats2d table (y z + stats cols)')
    ap.add_argument('--out-prefix', default='stats-duct')
    args = ap.parse_args()

    data = np.loadtxt(args.table)
    ncols = data.shape[1]
    # infer the (nz, ny) shape from the y column period (z-major rows)
    y = data[:, 0]
    ny = int(np.argmax(y[1:] <= y[:-1])) + 1 if len(y) > 1 else 1
    nz = data.shape[0] // ny
    tab = data.reshape(nz, ny, ncols)

    # wall bisector: the z row nearest the duct midplane
    kmid = nz // 2
    hdr = 'y z profiles at the z midplane (wall bisector)'
    np.savetxt(f'{args.out_prefix}-centerline.out', tab[kmid],
               fmt='%17.9e', header=hdr)

    # corner diagonal y == z (square ducts: ny == nz; otherwise the
    # nearest-index diagonal)
    n = min(ny, nz)
    idx_z = (np.arange(n) * nz) // n
    idx_y = (np.arange(n) * ny) // n
    diag = tab[idx_z, idx_y, :]
    np.savetxt(f'{args.out_prefix}-diagonal.out', diag,
               fmt='%17.9e', header='y z profiles along the corner diagonal')
    print(f'wrote {args.out_prefix}-centerline.out (row k={kmid}) and '
          f'{args.out_prefix}-diagonal.out ({n} points) from {nz}x{ny} table')


if __name__ == '__main__':
    main()
