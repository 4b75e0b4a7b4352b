"""Post-processing operator oracles (post.f90 parity)."""
import numpy as np
import jax.numpy as jnp

from cales_tpu.config import Config
from cales_tpu.grid import make_grid_from_config
from cales_tpu.ops.post import vorticity, q_criterion, rotation_rate_sq


def test_vorticity_solid_body():
    """u = -omega*y, v = omega*x (solid-body rotation): omega_z = 2*omega,
    omega_x = omega_y = 0 (post.f90:14-56)."""
    n = 16
    L = 1.0
    om = 0.7
    cfg = Config(ng=(n, n, n), l=(L, L, L), dtype='float64')
    grid = make_grid_from_config(cfg)
    dxi = dyi = float(n / L)
    # staggered coordinates incl. ghosts
    yc = (np.arange(-1, n + 1) + 0.5) / n
    yf = (np.arange(-1, n + 1) + 1.0) / n
    xc = (np.arange(-1, n + 1) + 0.5) / n
    xf = (np.arange(-1, n + 1) + 1.0) / n
    shape = (n + 2, n + 2, n + 2)
    u = np.broadcast_to((-om * yc)[None, :, None], shape).copy()
    v = np.broadcast_to((om * xc)[None, None, :], shape).copy()
    # v is y-face staggered but x-dependence uses cell centers of x: v(i,j,k)
    # at (xc_i, yf_j): unchanged. u at (xf_i, yc_j).
    w = np.zeros(shape)
    ox, oy, oz = vorticity(jnp.asarray(u), jnp.asarray(v), jnp.asarray(w),
                           dxi, dyi, grid.dzci)
    np.testing.assert_allclose(np.asarray(oz), 2 * om, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ox), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(oy), 0.0, atol=1e-12)
    # pure rotation: Q = 0.5*|Omega|^2 > 0, enstrophy = 0.5*(2 om)^2
    ens = np.asarray(rotation_rate_sq(jnp.asarray(u), jnp.asarray(v),
                                      jnp.asarray(w), dxi, dyi, grid.dzci))
    np.testing.assert_allclose(ens, 0.5 * (2 * om) ** 2, rtol=1e-12)
    q = np.asarray(q_criterion(jnp.asarray(u), jnp.asarray(v), jnp.asarray(w),
                               dxi, dyi, grid.dzci, grid.dzfi))
    assert (q > 0).all()


def test_q_criterion_pure_shear():
    """u = a*y: |S| = |Omega| -> Q = 0 (post.f90:196-211)."""
    n = 12
    cfg = Config(ng=(n, n, n), l=(1., 1., 1.), dtype='float64')
    grid = make_grid_from_config(cfg)
    yc = (np.arange(-1, n + 1) + 0.5) / n
    u = np.broadcast_to((0.9 * yc)[None, :, None], (n + 2,) * 3).copy()
    z = np.zeros_like(u)
    q = np.asarray(q_criterion(jnp.asarray(u), jnp.asarray(z), jnp.asarray(z),
                               float(n), float(n), grid.dzci, grid.dzfi))
    np.testing.assert_allclose(q, 0.0, atol=1e-12)
