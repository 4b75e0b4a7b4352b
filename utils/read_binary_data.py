#!/usr/bin/env python3
"""Read raw binary field dumps (checkpoints and out3d volumes).

Counterpart of /root/reference/utils/read_binary_data: files are a raw
stream in global Fortran order (x fastest).  Returns numpy arrays in the
framework's (z, y, x) layout.
"""
import argparse

import numpy as np


def read_field(path, ng, dtype=np.float32):
    nx, ny, nz = ng
    a = np.fromfile(path, dtype=dtype, count=nx * ny * nz)
    return a.reshape(nz, ny, nx)


def read_checkpoint(path, ng, dtype=np.float32):
    nx, ny, nz = ng
    n = nx * ny * nz
    raw = np.fromfile(path, dtype=dtype)
    fields = {name: raw[i * n:(i + 1) * n].reshape(nz, ny, nx)
              for i, name in enumerate(('u', 'v', 'w', 'p'))}
    fields['time'] = float(raw[4 * n])
    fields['istep'] = int(raw[4 * n + 1])
    return fields


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('file')
    ap.add_argument('--ng', type=int, nargs=3, required=True,
                    metavar=('NX', 'NY', 'NZ'))
    ap.add_argument('--dtype', default='float32')
    ap.add_argument('--checkpoint', action='store_true')
    args = ap.parse_args()
    if args.checkpoint:
        f = read_checkpoint(args.file, tuple(args.ng), np.dtype(args.dtype))
        print(f"time={f['time']} istep={f['istep']}")
        for k in ('u', 'v', 'w', 'p'):
            print(f"{k}: min={f[k].min():.6e} max={f[k].max():.6e} "
                  f"mean={f[k].mean():.6e}")
    else:
        a = read_field(args.file, tuple(args.ng), np.dtype(args.dtype))
        print(f"shape (z,y,x)={a.shape} min={a.min():.6e} max={a.max():.6e}")


if __name__ == '__main__':
    main()
