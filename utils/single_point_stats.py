#!/usr/bin/env python3
"""Time-average the per-snapshot single-point channel statistics and produce
inner-scaled profiles.

Counterpart of /root/reference/utils/single-point-stats.py: reads the
``stats_*.out`` files written at the iout1d cadence (io/stats.py, 27 columns
between zc/zf and dzc/dzf), averages over snapshots, computes u_tau from the
wall gradient, and writes mean/RMS profiles in wall units.
"""
import argparse
import glob

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('pattern', help="glob for stats files, e.g. 'data/stats_*.out'")
    ap.add_argument('--visc', type=float, required=True)
    ap.add_argument('--skip', type=int, default=0, help='skip first N snapshots')
    ap.add_argument('-o', '--out', default='stats_mean.out')
    args = ap.parse_args()

    files = sorted(glob.glob(args.pattern))[args.skip:]
    if not files:
        raise SystemExit('no files matched')
    acc = None
    for fn in files:
        d = np.loadtxt(fn)
        acc = d if acc is None else acc + d
    d = acc / len(files)

    zc = d[:, 0]
    um = d[:, 2]            # <u>
    uu = d[:, 5] - um ** 2  # <u'u'>
    vv = d[:, 6] - d[:, 3] ** 2
    ww = d[:, 7] - d[:, 4] ** 2
    uw = d[:, 8] - um * d[:, 4]
    # u_tau from the wall gradient of <u> (one-sided, first cell center)
    dudz_w = um[0] / zc[0]
    utau = np.sqrt(args.visc * dudz_w)
    retau = utau * (zc[-1] + zc[0]) / 2 / args.visc
    print(f'u_tau = {utau:.6e}, Re_tau ~ {retau:.1f}')

    zplus = zc * utau / args.visc
    cols = np.stack([zc, zplus, um / utau, uu / utau ** 2, vv / utau ** 2,
                     ww / utau ** 2, uw / utau ** 2], axis=1)
    hdr = 'zc z+ u+ <uu>+ <vv>+ <ww>+ <uw>+'
    np.savetxt(args.out, cols, header=hdr, fmt='%16.7e')
    print(f'wrote {args.out} ({len(files)} snapshots averaged)')


if __name__ == '__main__':
    main()
