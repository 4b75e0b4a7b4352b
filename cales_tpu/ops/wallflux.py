"""Wall-integrated fluxes and the alternative bulk-forcing controller.

Reference parity:
  * cmpt_wallshear   /root/reference/src/mom.f90:337-510 — area-averaged wall
    shear of each velocity component over each non-periodic wall pair
  * cmpt_scalflux    /root/reference/src/scal.f90:53-140
  * bulk-forcing alternative (wall-shear balance)
                     /root/reference/src/rk.f90:224-288
  * cmpt_dw_plus     /root/reference/src/sgs.f90:872-1017 — inner-scaled
    distance to the nearest wall
  * inflow           /root/reference/src/bound.f90:401-445

All operate on ghost-padded (nz+2, ny+2, nx+2) arrays.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _zline(arr1d, nz, lo=1):
    return jnp.asarray(arr1d[lo:lo + nz])


def cmpt_wallshear(cfg, grid, up, vp, wp, is_cmpt=(True, True, True)):
    """Wall-shear integrals (mom.f90:337-510).

    Returns (taux, tauy, tauz): tau?[d] is the mean wall shear of velocity
    component ? contributed by the wall pair normal to direction d, averaged
    over that wall's area; zero for periodic pairs.
    """
    nz = up.shape[0] - 2
    visc = cfg.visc
    dl = cfg.dl
    lx, ly, lz = cfg.l
    dxi, dyi = cfg.dli[0], cfg.dli[1]
    dzf = _zline(grid.dzf, nz)[:, None]
    dzci = grid.dzci
    nonper = [cfg.cbc_pre(d) != 'PP' for d in range(3)]
    taux = [jnp.zeros(()), jnp.zeros(()), jnp.zeros(())]
    tauy = [jnp.zeros(()), jnp.zeros(()), jnp.zeros(())]
    tauz = [jnp.zeros(()), jnp.zeros(()), jnp.zeros(())]
    wx = dl[0] / (lx * lz)   # dx*dzf/(lx*lz) weights applied with dzf below

    if is_cmpt[0]:
        if nonper[1]:  # du/dy at y walls (mom.f90:366-386)
            t = ((up[1:-1, 1, 1:-1] - up[1:-1, 0, 1:-1])
                 + (up[1:-1, -2, 1:-1] - up[1:-1, -1, 1:-1])) * dyi * visc
            taux[1] = jnp.sum(t * dzf * wx)
        if nonper[2]:  # du/dz at z walls (mom.f90:388-405)
            t0 = (up[1, 1:-1, 1:-1] - up[0, 1:-1, 1:-1]) * dzci[0] * visc
            t1 = (up[-2, 1:-1, 1:-1] - up[-1, 1:-1, 1:-1]) * dzci[nz] * visc
            taux[2] = jnp.sum(t0 + t1) * (dl[0] * dl[1]) / (lx * ly)
    if is_cmpt[1]:
        if nonper[0]:  # dv/dx at x walls (mom.f90:411-431)
            t = ((vp[1:-1, 1:-1, 1] - vp[1:-1, 1:-1, 0])
                 + (vp[1:-1, 1:-1, -2] - vp[1:-1, 1:-1, -1])) * dxi * visc
            tauy[0] = jnp.sum(t * dzf) * dl[1] / (ly * lz)
        if nonper[2]:  # dv/dz at z walls (mom.f90:433-450)
            t0 = (vp[1, 1:-1, 1:-1] - vp[0, 1:-1, 1:-1]) * dzci[0] * visc
            t1 = (vp[-2, 1:-1, 1:-1] - vp[-1, 1:-1, 1:-1]) * dzci[nz] * visc
            tauy[2] = jnp.sum(t0 + t1) * (dl[0] * dl[1]) / (lx * ly)
    if is_cmpt[2]:
        if nonper[0]:  # dw/dx at x walls (mom.f90:456-476)
            t = ((wp[1:-1, 1:-1, 1] - wp[1:-1, 1:-1, 0])
                 + (wp[1:-1, 1:-1, -2] - wp[1:-1, 1:-1, -1])) * dxi * visc
            tauz[0] = jnp.sum(t * dzf) * dl[1] / (ly * lz)
        if nonper[1]:  # dw/dy at y walls (mom.f90:478-496)
            t = ((wp[1:-1, 1, 1:-1] - wp[1:-1, 0, 1:-1])
                 + (wp[1:-1, -2, 1:-1] - wp[1:-1, -1, 1:-1])) * dyi * visc
            tauz[1] = jnp.sum(t * dzf) * dl[0] / (lx * lz)
    return jnp.stack(taux), jnp.stack(tauy), jnp.stack(tauz)


def cmpt_scalflux(cfg, grid, sp, alpha):
    """Wall-integrated diffusive scalar fluxes (scal.f90:53-140)."""
    nz = sp.shape[0] - 2
    dl = cfg.dl
    lx, ly, lz = cfg.l
    dxi, dyi = cfg.dli[0], cfg.dli[1]
    dzf = _zline(grid.dzf, nz)[:, None]
    dzci = grid.dzci
    nonper = [cfg.cbc_pre(d) != 'PP' for d in range(3)]
    fx = fy = fz = jnp.zeros(())
    if nonper[0]:
        t = ((sp[1:-1, 1:-1, 1] - sp[1:-1, 1:-1, 0])
             + (sp[1:-1, 1:-1, -2] - sp[1:-1, 1:-1, -1])) * dxi * alpha
        fx = jnp.sum(t * dzf) * dl[1] / (ly * lz)
    if nonper[1]:
        t = ((sp[1:-1, 1, 1:-1] - sp[1:-1, 0, 1:-1])
             + (sp[1:-1, -2, 1:-1] - sp[1:-1, -1, 1:-1])) * dyi * alpha
        fy = jnp.sum(t * dzf) * dl[0] / (lx * lz)
    if nonper[2]:
        t0 = (sp[1, 1:-1, 1:-1] - sp[0, 1:-1, 1:-1]) * dzci[0] * alpha
        t1 = (sp[-2, 1:-1, 1:-1] - sp[-1, 1:-1, 1:-1]) * dzci[nz] * alpha
        fz = jnp.sum(t0 + t1) * (dl[0] * dl[1]) / (lx * ly)
    return jnp.stack([fx, fy, fz])


def bulk_forcing_alternative(cfg, grid, up, vp, wp, f1, f2, tauxo, tauyo,
                             tauzo, is_first=True):
    """Pressure gradient that exactly balances the wall shear stresses
    (cmpt_bulk_forcing_alternative, rk.f90:224-288; explicit-diffusion branch),
    sustaining constant mass flux with zero net acceleration.

    Returns (f, taux, tauy, tauz) where f[d] is the dt-multiplied forcing for
    direction d and tau* should be stored for the next substep."""
    l = jnp.asarray(cfg.l)
    taux, tauy, tauz = cmpt_wallshear(cfg, grid, up, vp, wp,
                                      is_cmpt=cfg.is_forced)
    f = jnp.stack([
        f1 * jnp.sum(taux / l) + f2 * jnp.sum(tauxo / l),
        f1 * jnp.sum(tauy / l) + f2 * jnp.sum(tauyo / l),
        f1 * jnp.sum(tauz / l) + f2 * jnp.sum(tauzo / l),
    ])
    return f, taux, tauy, tauz


def cmpt_dw_plus(cfg, grid, cbcvel_eff, up, vp, wp):
    """Inner-scaled distance to the nearest wall (sgs.f90:872-1017):
    dw+ = dw sqrt(tau_w)/nu with tau_w from one-sided wall gradients at the
    nearest wall."""
    nz, ny, nx = up.shape[0] - 2, up.shape[1] - 2, up.shape[2] - 2
    visc = cfg.visc
    dl = cfg.dl
    dzci = grid.dzci
    dxi, dyi = cfg.dli[0], cfg.dli[1]
    from ..sgs import _wall_tauw_planes, SGSSetup
    setup = SGSSetup(cfg, grid, cbcvel_eff)
    tauw6 = _wall_tauw_planes(setup, up, vp, wp, dxi, dyi, dzci, visc)
    shape = (nz, ny, nx)
    dw = jnp.full(shape, 1e30, dtype=up.dtype)
    dwp = jnp.zeros(shape, dtype=up.dtype)
    for m in range(6):
        if not setup.is_wall6[m]:
            continue
        prof, ax = setup.dw1d[m]
        s1 = [1, 1, 1]
        s1[ax] = len(prof)
        dm = jnp.broadcast_to(jnp.asarray(prof, dtype=up.dtype).reshape(s1),
                              shape)
        tw = 0.5 * visc * jnp.broadcast_to(tauw6[m], shape)
        closer = dm < dw
        dwp = jnp.where(closer, dm * jnp.sqrt(tw) / visc, dwp)
        dw = jnp.minimum(dw, dm)
    return dwp


def inflow(idir, vel2d, u, v, w):
    """Set an inflow plane on the low face of direction idir
    (bound.f90:401-445): writes the wall-normal component's boundary plane.
    u, v, w: padded arrays; returns the updated normal-component array."""
    if idir == 0:
        return u.at[1:-1, 1:-1, 0].set(vel2d)
    if idir == 1:
        return v.at[1:-1, 0, 1:-1].set(vel2d)
    return w.at[0, 1:-1, 1:-1].set(vel2d)
