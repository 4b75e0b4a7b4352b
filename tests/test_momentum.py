"""Momentum-RHS oracle: 2nd-order convergence to the analytic Navier-Stokes
RHS for a smooth periodic manufactured field (SURVEY §7.2 stage 6; the
reference validates the same kernel with manufactured fields, mom.f90:20-22)."""
import numpy as np
import jax.numpy as jnp

from cales_tpu.config import Config
from cales_tpu.grid import make_grid_from_config
from cales_tpu.ops import stencil as st


def _fields(n, visc_t_const):
    """u = sin x cos y cos z, v = -cos x sin y cos z, w = 0 (divergence-free),
    on (2 pi)^3 with visct = const."""
    L = 2 * np.pi
    dx = L / n
    xf = (np.arange(-1, n + 1) + 1.0) * dx
    xc = (np.arange(-1, n + 1) + 0.5) * dx
    X_f, X_c = xf, xc
    u = (np.sin(X_f)[None, None, :] * np.cos(X_c)[None, :, None]
         * np.cos(X_c)[:, None, None])
    v = (-np.cos(X_c)[None, None, :] * np.sin(X_f)[None, :, None]
         * np.cos(X_c)[:, None, None])
    w = np.zeros_like(u)
    s = np.full_like(u, visc_t_const)
    return u, v, w, s, dx


def _exact_dudt(n, visc, visc_t):
    """analytic advection + diffusion for the field above, at u's locations."""
    L = 2 * np.pi
    dx = L / n
    xf = (np.arange(n) + 1.0) * dx
    xc = (np.arange(n) + 0.5) * dx
    sx = np.sin(xf)[None, None, :]
    cx = np.cos(xf)[None, None, :]
    sy = np.sin(xc)[None, :, None]
    cy = np.cos(xc)[None, :, None]
    sz = np.sin(xc)[:, None, None]
    cz = np.cos(xc)[:, None, None]
    # advection: -(d(uu)/dx + d(vu)/dy + d(wu)/dz)
    # uu = sin^2x cos^2y cos^2z; vu = -sinx cosx siny cosy cos^2z
    adv = -(2 * sx * cx * cy ** 2 * cz ** 2
            - (cx ** 2 - sx ** 2) * 0 * 0)  # placeholder, assembled below
    duu_dx = 2 * sx * cx * (cy * cz) ** 2
    dvu_dy = -sx * cx * (cy ** 2 - sy ** 2) * cz ** 2
    adv = -(duu_dx + dvu_dy)
    # diffusion: (visc + 2*visc_t for the full-stress normal term... for
    # constant visct the stress divergence reduces to (visc+visc_t) lap(u)
    # because div(u)=0 and visct is uniform)
    lap_u = -3.0 * sx * cy * cz
    return adv + (visc + visc_t) * lap_u


def test_momentum_rhs_convergence():
    visc, visc_t = 0.01, 0.003
    errs = []
    for n in (16, 32, 64):
        cfg = Config(ng=(n, n, n), l=(2 * np.pi,) * 3, dtype='float64')
        grid = make_grid_from_config(cfg)
        u, v, w, s, dx = _fields(n, visc_t)
        (du, dxy, dz), _, _ = st.momentum_rhs(
            jnp.asarray(u), jnp.asarray(v), jnp.asarray(w), jnp.asarray(s),
            visc, 1.0 / dx, 1.0 / dx, grid.dzci, grid.dzfi)
        rhs = np.asarray(du + dxy + dz)
        exact = _exact_dudt(n, visc, visc_t)
        errs.append(np.abs(rhs - exact).max())
    # 2nd-order: error ratio ~4 per refinement
    r1 = errs[0] / errs[1]
    r2 = errs[1] / errs[2]
    assert 3.3 < r1 < 4.7, f"not 2nd order: ratios {r1}, {r2} errs {errs}"
    assert 3.3 < r2 < 4.7, f"not 2nd order: ratios {r1}, {r2} errs {errs}"
