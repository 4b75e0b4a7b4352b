#!/usr/bin/env python3
"""Generate an XDMF index for the raw binary volume/plane dumps so they can
be opened in ParaView/VisIt.

Counterpart of /root/reference/utils/write_xdmf.py: consumes the visu log
files written by the driver (log_visu_3d.out / log_visu_2d_slice_1.out,
io/output.py write_log_output) plus grid.bin, and emits an .xmf file with one
temporal collection per variable set.
"""
import argparse
import os

import numpy as np

HEADER = """<?xml version="1.0" ?>
<!DOCTYPE Xdmf SYSTEM "Xdmf.dtd" []>
<Xdmf Version="2.0">
 <Domain>
"""
FOOTER = """ </Domain>
</Xdmf>
"""


def read_log(path):
    entries = []
    with open(path) as f:
        for line in f:
            t = line.split()
            if len(t) < 13:
                continue
            entries.append(dict(
                fname=t[0], var=t[1],
                nmin=tuple(int(x) for x in t[2:5]),
                nmax=tuple(int(x) for x in t[5:8]),
                nskip=tuple(int(x) for x in t[8:11]),
                time=float(t[11]), istep=int(t[12])))
    return entries


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('datadir')
    ap.add_argument('--log', default='log_visu_3d.out')
    ap.add_argument('--ng', type=int, nargs=3, required=True)
    ap.add_argument('--l', type=float, nargs=3, required=True)
    ap.add_argument('--dtype', default='float32')
    ap.add_argument('-o', '--out', default='viewfld.xmf')
    args = ap.parse_args()

    entries = read_log(os.path.join(args.datadir, args.log))
    nx, ny, nz = args.ng
    prec = 4 if np.dtype(args.dtype).itemsize == 4 else 8
    dx, dy = args.l[0] / nx, args.l[1] / ny
    # z coordinates from grid.bin (zc block is third of four)
    grid = np.fromfile(os.path.join(args.datadir, 'grid.bin'), dtype=np.float64)
    zc = grid[2 * nz:3 * nz]

    steps = sorted({e['istep'] for e in entries})
    byvar = {}
    for e in entries:
        byvar.setdefault(e['istep'], []).append(e)

    with open(os.path.join(args.datadir, args.out), 'w') as f:
        f.write(HEADER)
        f.write('  <Grid Name="TimeSeries" GridType="Collection" '
                'CollectionType="Temporal">\n')
        for istep in steps:
            es = byvar[istep]
            t = es[0]['time']
            f.write(f'   <Grid Name="T{istep}" GridType="Uniform">\n')
            f.write(f'    <Time Value="{t}"/>\n')
            f.write(f'    <Topology TopologyType="3DRectMesh" '
                    f'Dimensions="{nz} {ny} {nx}"/>\n')
            f.write('    <Geometry GeometryType="VXVYVZ">\n')
            for name, n_, d in (('X', nx, dx), ('Y', ny, dy)):
                f.write(f'     <DataItem Dimensions="{n_}" Format="XML">')
                f.write(' '.join(f'{(i + 0.5) * d:.7e}' for i in range(n_)))
                f.write('</DataItem>\n')
            f.write(f'     <DataItem Dimensions="{nz}" Format="XML">')
            f.write(' '.join(f'{z:.7e}' for z in zc))
            f.write('</DataItem>\n    </Geometry>\n')
            for e in es:
                f.write(f'    <Attribute Name="{e["var"]}" Center="Node">\n')
                f.write(f'     <DataItem Format="Binary" '
                        f'DataType="Float" Precision="{prec}" Endian="Little" '
                        f'Dimensions="{nz} {ny} {nx}">{e["fname"]}</DataItem>\n')
                f.write('    </Attribute>\n')
            f.write('   </Grid>\n')
        f.write('  </Grid>\n')
        f.write(FOOTER)
    print(f'wrote {os.path.join(args.datadir, args.out)} '
          f'({len(steps)} time steps)')


if __name__ == '__main__':
    main()
