"""Wall-distance field.

Port of /root/reference/src/dist.f90:15-94 (`wall_dist`): minimum distance of
each cell center to any Dirichlet (no-slip/no-penetration) wall.  Like the
reference — where the module is compiled and imported by the driver but never
invoked (main.f90:47; SURVEY.md §2.1) — this is a library utility, available
for wall-damping models and diagnostics.
"""
from __future__ import annotations

import numpy as np

from .config import Config, effective_cbcvel
from .grid import Grid


def wall_dist(cfg: Config, grid: Grid) -> np.ndarray:
    """(nz, ny, nx) distance to the nearest Dirichlet wall (big if none)."""
    nx, ny, nz = cfg.ng
    cbc = effective_cbcvel(cfg)
    big = 1e30
    dl = cfg.dl
    i = np.arange(1, nx + 1)
    j = np.arange(1, ny + 1)
    zc = grid.zc[1:nz + 1]
    d = np.full((nz, ny, nx), big)
    if cbc[0][0][0] == 'D':
        d = np.minimum(d, (dl[0] * (i - 0.5))[None, None, :])
    if cbc[1][0][0] == 'D':
        d = np.minimum(d, (dl[0] * (nx - i + 0.5))[None, None, :])
    if cbc[0][1][1] == 'D':
        d = np.minimum(d, (dl[1] * (j - 0.5))[None, :, None])
    if cbc[1][1][1] == 'D':
        d = np.minimum(d, (dl[1] * (ny - j + 0.5))[None, :, None])
    if cbc[0][2][2] == 'D':
        d = np.minimum(d, zc[:, None, None])
    if cbc[1][2][2] == 'D':
        d = np.minimum(d, (cfg.l[2] - zc)[:, None, None])
    return d
