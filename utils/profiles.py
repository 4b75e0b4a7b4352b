#!/usr/bin/env python3
"""Instantaneous mean profiles from a checkpoint.

Counterpart of /root/reference/utils/profiles.py: reads a ``fld.bin``-format
checkpoint plus the run's ``geometry.out``/``grid.bin`` artifacts, averages
u, v, w, p over the homogeneous (x, y) directions, and writes a z-profile
table.

Usage: python utils/profiles.py data/fld.bin [--dtype float32] [--out profiles.out]
"""
import argparse
from pathlib import Path

import numpy as np


def read_geometry(datadir: Path):
    geo = np.loadtxt(datadir / 'geometry.out', comments='!', max_rows=2)
    ng = geo[0].astype(int)
    l = geo[1]
    return tuple(ng), tuple(l)


def read_zgrid(datadir: Path, nz: int):
    raw = np.fromfile(datadir / 'grid.bin', dtype=np.float64)
    # grid.bin: dzc, dzf, zc, zf interior profiles (io/output.write_grid_files)
    return raw[2 * nz:3 * nz]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('checkpoint', help='path to fld.bin-format checkpoint')
    ap.add_argument('--dtype', default='float32',
                    choices=['float32', 'float64'])
    ap.add_argument('--out', default=None)
    args = ap.parse_args()

    path = Path(args.checkpoint)
    datadir = path.parent
    ng, l = read_geometry(datadir)
    nx, ny, nz = ng
    n = nx * ny * nz
    raw = np.fromfile(path, dtype=args.dtype)
    expected = 4 * n + 2
    if raw.size != expected:
        raise SystemExit(f'size mismatch: {raw.size} values, expected '
                         f'{expected} for ng={ng} dtype={args.dtype}')
    fields = [raw[m * n:(m + 1) * n].reshape(nz, ny, nx) for m in range(4)]
    time, istep = float(raw[4 * n]), int(round(float(raw[4 * n + 1])))
    zc = read_zgrid(datadir, nz)

    out = args.out or (datadir / f'profiles_{istep:07d}.out')
    means = [f.mean(axis=(1, 2)) for f in fields]
    with open(out, 'w') as f:
        f.write(f'# t = {time}, istep = {istep}; columns: zc <u> <v> <w> <p>\n')
        for k in range(nz):
            f.write(' '.join(f'{v:16.8e}' for v in
                             (zc[k], *[m[k] for m in means])) + '\n')
    print(f'wrote {out}')


if __name__ == '__main__':
    main()
