"""Wall-flux integrals vs brute-force reference loops + analytic Poiseuille."""
import numpy as np
import jax.numpy as jnp

from cales_tpu.config import Config, effective_cbcvel
from cales_tpu.grid import make_grid_from_config
from cales_tpu.ops.wallflux import cmpt_wallshear, cmpt_scalflux, cmpt_dw_plus


def test_wallshear_poiseuille_analytic():
    """Steady Poiseuille profile: wall shear integral = 2 * 6 visc ubulk/lz
    (both walls), computed from the discrete one-sided gradients."""
    nz = 32
    cfg = Config(ng=(8, 6, nz), l=(1., 1., 1.), visci=100., dtype='float64')
    grid = make_grid_from_config(cfg)
    zc = grid.zc[0:nz + 2]
    prof = 6.0 * zc * (1.0 - zc)      # includes ghost entries
    u = np.broadcast_to(prof[:, None, None], (nz + 2, 8, 10)).copy()
    # apply no-slip ghost like pad: u(0) = 2*0 - u(1)
    u[0] = -u[1]
    u[-1] = -u[-2]
    z = np.zeros_like(u)
    taux, tauy, tauz = cmpt_wallshear(cfg, grid, jnp.asarray(u),
                                      jnp.asarray(z), jnp.asarray(z))
    visc = cfg.visc
    # discrete one-sided gradient at the wall: (u1 - ughost)*dzci(0)
    dz = 1.0 / nz
    u1 = 6.0 * (dz / 2) * (1 - dz / 2)
    expect = 2.0 * (2 * u1 / dz) * visc   # both walls
    np.testing.assert_allclose(float(taux[2]), expect, rtol=1e-12)
    assert float(taux[1]) == 0.0  # y periodic


def test_scalflux_brute_force():
    cfg = Config(ng=(6, 5, 8), l=(1., 2., 1.5), dtype='float64',
                 cbcvel=((('P', 'D', 'D'),) * 3, (('P', 'D', 'D'),) * 3),
                 cbcpre=(('P', 'N', 'N'), ('P', 'N', 'N')))
    grid = make_grid_from_config(cfg)
    rng = np.random.default_rng(0)
    sp = rng.standard_normal((10, 7, 8))
    alpha = 0.03
    flux = np.asarray(cmpt_scalflux(cfg, grid, jnp.asarray(sp), alpha))
    # brute force y-flux (scal.f90:96-116)
    nz, ny, nx = 8, 5, 6
    dyi = cfg.dli[1]
    fy = 0.0
    for k in range(1, nz + 1):
        for i in range(1, nx + 1):
            fy += (sp[k, 1, i] - sp[k, 0, i]) * dyi * alpha \
                / (cfg.dli[0] * grid.dzfi[k] * cfg.l[0] * cfg.l[2])
            fy += (sp[k, ny, i] - sp[k, ny + 1, i]) * dyi * alpha \
                / (cfg.dli[0] * grid.dzfi[k] * cfg.l[0] * cfg.l[2])
    np.testing.assert_allclose(flux[1], fy, rtol=1e-12)
    assert flux[0] == 0.0


def test_dw_plus_channel():
    """dw+ must equal dw*sqrt(tau_w)/nu with the nearest-wall tau."""
    nz = 16
    cfg = Config(ng=(8, 6, nz), l=(1., 1., 2.), visci=500., dtype='float64')
    grid = make_grid_from_config(cfg)
    rng = np.random.default_rng(1)
    up = rng.standard_normal((nz + 2, 8, 10))
    vp = rng.standard_normal((nz + 2, 8, 10))
    wp = rng.standard_normal((nz + 2, 8, 10))
    dwp = np.asarray(cmpt_dw_plus(cfg, grid, effective_cbcvel(cfg),
                                  jnp.asarray(up), jnp.asarray(vp),
                                  jnp.asarray(wp)))
    assert dwp.shape == (nz, 6, 8)
    assert np.isfinite(dwp).all() and (dwp >= 0).all()
    # bottom half uses the bottom wall distance
    zc = grid.zc[1:nz + 1]
    visc = cfg.visc
    i, j, k = 3, 2, 1
    t1 = up[1, j + 1, i + 1] - up[0, j + 1, i + 1] + up[1, j + 1, i] - up[0, j + 1, i]
    t2 = vp[1, j + 1, i + 1] - vp[0, j + 1, i + 1] + vp[1, j, i + 1] - vp[0, j, i + 1]
    tw = 0.5 * visc * np.sqrt(t1 ** 2 + t2 ** 2) * grid.dzci[0]
    np.testing.assert_allclose(dwp[k, j, i], zc[k] * np.sqrt(tw) / visc,
                               rtol=1e-12)
