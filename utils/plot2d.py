#!/usr/bin/env python3
"""Plot a 2D plane slice written by the iout2d cadence.

Counterpart of /root/reference/utils/other_utilities/plot2d/ (a reader +
matplotlib contour example for one planar binary slice).  Our io/output.out2d
writes the raw row-major float array (no Fortran record markers), so the
reader is a plain fromfile + reshape; grid extents come from the CLI instead
of a param.py.

Usage:
    python utils/plot2d.py data/slice.bin --n 256 192 --l 6.28 2.0 \
        [--dtype float32] [--title u] [--out slice.png]

Requires matplotlib only when plotting (reading works without it).
"""
import argparse

import numpy as np


def read_slice(fname, n1, n2, dtype='float64'):
    """Read one out2d plane: n1 = fast (inner) dimension, n2 = slow."""
    fld = np.fromfile(fname, dtype=dtype)
    if fld.size != n1 * n2:
        raise SystemExit(f'{fname}: {fld.size} values, expected {n1}x{n2}')
    return fld.reshape(n2, n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('file')
    ap.add_argument('--n', type=int, nargs=2, required=True,
                    metavar=('N1', 'N2'), help='inner, outer dimension')
    ap.add_argument('--l', type=float, nargs=2, default=None,
                    metavar=('L1', 'L2'), help='domain extents (default: n)')
    ap.add_argument('--dtype', default='float64',
                    choices=['float32', 'float64'])
    ap.add_argument('--title', default='')
    ap.add_argument('--out', default=None, help='save instead of show')
    args = ap.parse_args()

    fld = read_slice(args.file, args.n[0], args.n[1], args.dtype)
    l1, l2 = args.l if args.l else (float(args.n[0]), float(args.n[1]))
    print(f'{args.file}: {fld.shape[1]}x{fld.shape[0]}  '
          f'min={fld.min():.6g} max={fld.max():.6g} mean={fld.mean():.6g}')

    import matplotlib
    if args.out:
        matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    x1 = (np.arange(args.n[0]) + 0.5) * l1 / args.n[0]
    x2 = (np.arange(args.n[1]) + 0.5) * l2 / args.n[1]
    fig, ax = plt.subplots(figsize=(6, 6 * l2 / l1 + 1))
    cs = ax.contourf(x1, x2, fld, levels=32)
    fig.colorbar(cs, orientation='vertical')
    ax.set_title(args.title)
    ax.set_xlabel('x1')
    ax.set_ylabel('x2')
    fig.tight_layout()
    if args.out:
        fig.savefig(args.out, dpi=150)
        print(f'wrote {args.out}')
    else:
        plt.show()


if __name__ == '__main__':
    main()
