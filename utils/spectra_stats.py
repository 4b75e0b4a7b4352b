#!/usr/bin/env python3
"""1D streamwise/spanwise energy spectra at selected z planes.

Counterpart of /root/reference/utils/spectra-stats.py: reads a checkpoint or
volume dump and writes E_uu(kx), E_uu(ky) (and v, w) at requested z indices.
"""
import argparse

import numpy as np


def spectra_1d(f, axis):
    """One-sided energy spectrum along `axis` (2=x, 1=y), averaged over the
    other homogeneous direction; f: (ny, nx) plane."""
    n = f.shape[axis - 1 if axis == 2 else 1]  # length along the axis
    fh = np.fft.rfft(f, axis=1 if axis == 2 else 0)
    e = np.abs(fh) ** 2
    e = e.mean(axis=0 if axis == 2 else 1)
    n_ax = f.shape[1] if axis == 2 else f.shape[0]
    e = e / n_ax ** 2
    e[1:] *= 2.0
    return e


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('file', help='fld.bin checkpoint')
    ap.add_argument('--ng', type=int, nargs=3, required=True)
    ap.add_argument('--dtype', default='float32')
    ap.add_argument('--kplanes', type=int, nargs='+', required=True,
                    help='0-based z indices')
    ap.add_argument('-o', '--out', default='spectra')
    args = ap.parse_args()
    nx, ny, nz = args.ng
    n = nx * ny * nz
    raw = np.fromfile(args.file, dtype=np.dtype(args.dtype))
    fields = {nm: raw[i * n:(i + 1) * n].reshape(nz, ny, nx)
              for i, nm in enumerate(('u', 'v', 'w'))}
    for k in args.kplanes:
        cols_x = [np.arange(nx // 2 + 1)]
        cols_y = [np.arange(ny // 2 + 1)]
        for nm in ('u', 'v', 'w'):
            cols_x.append(spectra_1d(fields[nm][k], axis=2))
            cols_y.append(spectra_1d(fields[nm][k], axis=1))
        np.savetxt(f'{args.out}_kx_z{k:04d}.out', np.stack(cols_x, 1),
                   header='kx Euu Evv Eww')
        np.savetxt(f'{args.out}_ky_z{k:04d}.out', np.stack(cols_y, 1),
                   header='ky Euu Evv Eww')
        print(f'wrote spectra at z index {k}')


if __name__ == '__main__':
    main()
