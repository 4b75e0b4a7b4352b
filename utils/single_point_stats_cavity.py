#!/usr/bin/env python3
"""Lid-driven-cavity centerline profiles (the Ghia-style validation curves).

Counterpart of /root/reference/utils/single-point-stats-cavity.py: from a 3D
velocity snapshot it extracts
  * u along the vertical (z) centerline at the cavity midplane, and
  * w along the horizontal (y) centerline at the cavity midplane,
each averaged over the two cells straddling the center (staggered grid) and
over the periodic x direction, for comparison against published cavity data
(e.g. Ghia et al. 1982 at Re = 100-10000).

Input: u_*.bin / w_*.bin field dumps written by the out3d hook (global
Fortran order == our (z, y, x) C-order; io/output.write_field_bin) plus the
data directory's geometry.out / grid.bin for the (possibly stretched) z grid.

Usage:
  python utils/single_point_stats_cavity.py data/u_0005000.bin \
      data/w_0005000.bin --datadir data [--out results/]
"""
import argparse
import os

import numpy as np


def read_geometry(datadir):
    geo = np.loadtxt(os.path.join(datadir, 'geometry.out'), comments='!',
                     max_rows=2)
    ng = geo[0].astype(int)      # (nx, ny, nz)
    l = geo[1]
    gridbin = os.path.join(datadir, 'grid.bin')
    nz = ng[2]
    if os.path.exists(gridbin):
        g = np.fromfile(gridbin, dtype=np.float64).reshape(4, nz)
        zc, zf = g[2], g[3]
    else:
        zc = (np.arange(nz) + 0.5) * l[2] / nz
        zf = (np.arange(nz) + 1.0) * l[2] / nz
    return ng, l, zc, zf


def read_field(fname, ng):
    nx, ny, nz = int(ng[0]), int(ng[1]), int(ng[2])
    a = np.fromfile(fname, dtype=np.float64)
    if a.size != nx * ny * nz:
        raise SystemExit(f'{fname}: {a.size} values, expected {nx*ny*nz} '
                         f'for ng={tuple(ng)}')
    return a.reshape(nz, ny, nx)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('ufile', help="u snapshot (u_*.bin)")
    ap.add_argument('wfile', help="w snapshot (w_*.bin)")
    ap.add_argument('--datadir', default='data')
    ap.add_argument('--out', default='results')
    args = ap.parse_args()

    ng, l, zc, zf = read_geometry(args.datadir)
    nx, ny, nz = int(ng[0]), int(ng[1]), int(ng[2])
    u = read_field(args.ufile, ng)
    w = read_field(args.wfile, ng)
    os.makedirs(args.out, exist_ok=True)

    # u(z) on the vertical centerline: average the two y cells straddling
    # y = l_y/2 and the periodic x direction
    jc = ny // 2
    u_line = 0.5 * (u[:, jc - 1, :] + u[:, jc, :]).mean(axis=1)
    fn = os.path.join(args.out, 'stats-single-point-cavi-vertical.out')
    np.savetxt(fn, np.column_stack((zc, u_line)), fmt='%16.6e')

    # w(y) on the horizontal centerline: average the two z cells straddling
    # z = l_z/2 (w is z-face staggered: face k sits at zf[k]) and over x
    kc = int(np.searchsorted(zf, l[2] / 2.0))
    w_line = 0.5 * (w[max(kc - 1, 0), :, :] + w[kc, :, :]).mean(axis=1)
    yc = (np.arange(ny) + 0.5) * l[1] / ny
    fn2 = os.path.join(args.out, 'stats-single-point-cavi-horizontal.out')
    np.savetxt(fn2, np.column_stack((yc, w_line)), fmt='%16.6e')
    print(f'wrote {fn}\nwrote {fn2}')


if __name__ == '__main__':
    main()
