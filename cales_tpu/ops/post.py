"""Post-processing operators: vorticity, rotation/strain invariants,
Q-criterion.

Port of /root/reference/src/post.f90:
  * vorticity (cell-centered, 14-56)
  * one-component edge vorticity (104-151)
  * rotation-rate magnitude (58-102) and strain-rate via ops.stencil
  * Q-criterion (196-211)

Used by the output hooks (the reference's out?d.h90 include files) and the
utils/ post-processing scripts.
"""
from __future__ import annotations

from .stencil import _sh, _zb, strain_rate


def vorticity(up, vp, wp, dxi, dyi, dzci):
    """Cell-centered vorticity vector (post.f90:14-56): each component is the
    average of the four surrounding edge circulations."""
    nz = up.shape[0] - 2
    dzci_c = _zb(dzci, 1, nz + 1)
    dzci_m = _zb(dzci, 0, nz)

    def V(P, k=0, j=0, i=0):
        return _sh(P, k, j, i)

    # omega_x = dw/dy - dv/dz at (i, j±1/2, k±1/2) edges -> averaged
    ox = 0.25 * (
        (V(wp) - V(wp, j=-1)) * dyi - (V(vp) - V(vp, k=-1)) * dzci_m
        + (V(wp, j=1) - V(wp)) * dyi - (V(vp, j=1) - V(vp, j=1, k=-1)) * dzci_m
        + (V(wp, k=1) - V(wp, k=1, j=-1)) * dyi - (V(vp, k=1) - V(vp)) * dzci_c
        + (V(wp, k=1, j=1) - V(wp, k=1)) * dyi
        - (V(vp, j=1, k=1) - V(vp, j=1)) * dzci_c)
    # omega_y = du/dz - dw/dx
    oy = 0.25 * (
        (V(up) - V(up, k=-1)) * dzci_m - (V(wp) - V(wp, i=-1)) * dxi
        + (V(up, i=1) - V(up, i=1, k=-1)) * dzci_m - (V(wp, i=1) - V(wp)) * dxi
        + (V(up, k=1) - V(up)) * dzci_c - (V(wp, k=1) - V(wp, k=1, i=-1)) * dxi
        + (V(up, i=1, k=1) - V(up, i=1)) * dzci_c
        - (V(wp, k=1, i=1) - V(wp, k=1)) * dxi)
    # omega_z = dv/dx - du/dy
    oz = 0.25 * (
        (V(vp) - V(vp, i=-1)) * dxi - (V(up) - V(up, j=-1)) * dyi
        + (V(vp, i=1) - V(vp)) * dxi - (V(up, i=1) - V(up, i=1, j=-1)) * dyi
        + (V(vp, j=1) - V(vp, j=1, i=-1)) * dxi - (V(up, j=1) - V(up)) * dyi
        + (V(vp, j=1, i=1) - V(vp, j=1)) * dxi
        - (V(up, i=1, j=1) - V(up, i=1)) * dyi)
    return ox, oy, oz


def rotation_rate_sq(up, vp, wp, dxi, dyi, dzci):
    """Enstrophy density |Omega|^2 = 0.5 |omega|^2 at cell centers
    (post.f90:58-102)."""
    ox, oy, oz = vorticity(up, vp, wp, dxi, dyi, dzci)
    return 0.5 * (ox ** 2 + oy ** 2 + oz ** 2)


def q_criterion(up, vp, wp, dxi, dyi, dzci, dzfi):
    """Q = 0.5 (|Omega|^2 - |S|^2) (post.f90:196-211)."""
    enst = rotation_rate_sq(up, vp, wp, dxi, dyi, dzci)
    s0 = strain_rate(up, vp, wp, dzci, dzfi, dxi, dyi)
    return 0.5 * (enst - 0.5 * s0 ** 2)
