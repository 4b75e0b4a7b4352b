#!/usr/bin/env python3
"""Velocity-fluctuation PDFs from 3D snapshot fields.

Counterpart of /root/reference/utils/pdf-stats.py: reads the out3d binary
snapshots (``u_*.bin`` etc., written by the driver's default out3d hook),
removes the plane mean per z level, and histograms the fluctuations at
selected z planes into normalized PDFs.

Usage: python utils/pdf_stats.py data/u_0001000.bin --ng 256 128 128 \
           [--planes 8 32 64] [--bins 100] [--dtype float32]
"""
import argparse
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('snapshot')
    ap.add_argument('--ng', type=int, nargs=3, required=True,
                    metavar=('NX', 'NY', 'NZ'))
    ap.add_argument('--planes', type=int, nargs='+', default=None,
                    help='z plane indices (default: quarter points)')
    ap.add_argument('--bins', type=int, default=100)
    ap.add_argument('--dtype', default='float32')
    args = ap.parse_args()

    nx, ny, nz = args.ng
    f = np.fromfile(args.snapshot, dtype=args.dtype)
    if f.size != nx * ny * nz:
        raise SystemExit(f'{f.size} values != nx*ny*nz (decimated out3d '
                         'snapshots need the decimated ng)')
    f = f.reshape(nz, ny, nx).astype(np.float64)
    fluct = f - f.mean(axis=(1, 2), keepdims=True)
    planes = args.planes or [nz // 4, nz // 2, 3 * nz // 4]

    stem = Path(args.snapshot).with_suffix('')
    for k in planes:
        sample = fluct[k].ravel()
        std = sample.std() or 1.0
        hist, edges = np.histogram(sample / std, bins=args.bins, density=True)
        centers = 0.5 * (edges[:-1] + edges[1:])
        out = f'{stem}_pdf_z{k:04d}.out'
        np.savetxt(out, np.column_stack([centers, hist]),
                   header=f'fluctuation/std pdf (z plane {k}, '
                          f'std={std:.6e})')
        print(f'wrote {out}')


if __name__ == '__main__':
    main()
