"""Pallas mega-kernel parity vs the XLA expression path (interpret mode on
CPU; the compiled TPU path is experimental — see the module docstring)."""
import numpy as np
import jax.numpy as jnp

from cales_tpu.config import Config
from cales_tpu.grid import make_grid_from_config
from cales_tpu.ops import stencil as st
from cales_tpu.ops.pallas_kernels import fused_mom_update


def test_fused_mom_update_matches_xla():
    ng = (32, 16, 16)
    cfg = Config(ng=ng, l=(2 * np.pi, np.pi, 2.0), gtype=1, gr=1.0,
                 dtype='float64')
    grid = make_grid_from_config(cfg)
    nz, ny, nx = 16, 16, 32
    rng = np.random.default_rng(0)
    up, vp, wp, sp, ppad = (jnp.asarray(rng.standard_normal(
        (nz + 2, ny + 2, nx + 2))) for _ in range(5))
    ruo, rvo, rwo = (jnp.asarray(rng.standard_normal((nz, ny, nx)))
                     for _ in range(3))
    f1, f2, visc = 0.5e-3, -0.2e-3, 0.01
    dxi, dyi = float(ng[0] / cfg.l[0]), float(ng[1] / cfg.l[1])
    bforce = (0.1, 0.0, 0.0)
    out = fused_mom_update(up, vp, wp, sp, ppad, ruo, rvo, rwo,
                           grid.dzci, grid.dzfi, f1, f2, visc, dxi, dyi,
                           bforce, interpret=True)
    assert out is not None
    u_n, v_n, w_n, ru, rv, rw = out
    (eu, exy, ez), (ev, exyv, ezv), (ew, exyw, ezw) = st.momentum_rhs(
        up, vp, wp, sp, visc, dxi, dyi, grid.dzci, grid.dzfi)
    f12 = f1 + f2
    pc = ppad[1:-1, 1:-1, 1:-1]
    u_ref = up[1:-1, 1:-1, 1:-1] + f1 * (eu + exy + ez) + f2 * ruo \
        + f12 * (bforce[0] - dxi * (ppad[1:-1, 1:-1, 2:] - pc))
    w_ref = wp[1:-1, 1:-1, 1:-1] + f1 * (ew + exyw + ezw) + f2 * rwo \
        + f12 * (bforce[2] - grid.dzci[1:nz + 1][:, None, None]
                 * (ppad[2:, 1:-1, 1:-1] - pc))
    np.testing.assert_allclose(np.asarray(u_n), np.asarray(u_ref), atol=1e-13)
    np.testing.assert_allclose(np.asarray(w_n), np.asarray(w_ref), atol=1e-13)
    np.testing.assert_allclose(np.asarray(rv), np.asarray(ev + exyv + ezv),
                               atol=1e-11)
