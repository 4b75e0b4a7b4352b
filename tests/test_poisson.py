"""3D direct-solver residual tests: L p = rhs to near machine precision for a
matrix of BC combinations x staggerings, on stretched z grids (SURVEY §7.2
stage 4; reference solver.f90:20-80, initsolver.f90)."""
import numpy as np
import pytest
import jax.numpy as jnp

from cales_tpu.config import Config
from cales_tpu.grid import make_grid
from cales_tpu.poisson import make_solver, solve, tridmatrix
from tests.test_transforms import dense_lap_1d


def dense_lap_z(bc, c_or_f, grid):
    n = grid.n
    a, b, c = tridmatrix(bc, n, grid.dzci, grid.dzfi, c_or_f)
    m = n - 1 if (c_or_f == 'f' and bc[1] == 'D') else n
    L = np.zeros((m, m))
    for k in range(m):
        L[k, k] = b[k]
        if k > 0:
            L[k, k - 1] = a[k]
        if k < m - 1:
            L[k, k + 1] = c[k]
    if bc == 'PP':
        L[0, m - 1] = a[0]
        L[m - 1, 0] = c[m - 1]
    return L


def apply_lap3d(p, cbc, c_or_f, cfg, grid):
    nx, ny, nz = cfg.ng
    dli = cfg.dli
    Lx = dense_lap_1d(cbc[0], c_or_f[0], nx) * dli[0] ** 2
    Ly = dense_lap_1d(cbc[1], c_or_f[1], ny) * dli[1] ** 2
    Lz = dense_lap_z(cbc[2], c_or_f[2], grid)
    sx, sy, sz = Lx.shape[0], Ly.shape[0], Lz.shape[0]
    pb = p[:sz, :sy, :sx]
    out = np.einsum('ab,zyb->zya', Lx, pb)
    out += np.einsum('ab,zbx->zax', Ly, pb)
    out += np.einsum('ab,byx->ayx', Lz, pb)
    return out, (sz, sy, sx)


CASES = [
    # (cbc_x, cbc_y, cbc_z, c_or_f, singular)
    (('PP', 'PP', 'PP'), ('c', 'c', 'c'), True),    # tri-periodic pressure
    (('PP', 'PP', 'NN'), ('c', 'c', 'c'), True),    # channel pressure
    (('PP', 'NN', 'NN'), ('c', 'c', 'c'), True),    # duct pressure
    (('NN', 'NN', 'NN'), ('c', 'c', 'c'), True),    # cavity pressure
    (('PP', 'PP', 'DD'), ('f', 'c', 'c'), False),   # u Helmholtz (channel)
    (('PP', 'PP', 'DD'), ('c', 'f', 'c'), False),   # v Helmholtz
    (('PP', 'PP', 'DD'), ('c', 'c', 'f'), False),   # w Helmholtz
    (('DD', 'PP', 'DD'), ('f', 'c', 'c'), False),   # u with x walls (duct-x)
    (('ND', 'PP', 'NN'), ('c', 'c', 'c'), False),   # mixed ND
    (('DN', 'DD', 'NN'), ('c', 'c', 'c'), False),   # mixed DN
    (('DD', 'DD', 'DD'), ('f', 'c', 'c'), False),   # face DD in x
    (('NN', 'DD', 'DD'), ('f', 'c', 'c'), False),   # face NN in x
    (('ND', 'DD', 'DD'), ('f', 'c', 'c'), False),   # face ND in x
    (('DN', 'DD', 'DD'), ('f', 'c', 'c'), False),   # face DN in x
]


@pytest.mark.parametrize("cbc,c_or_f,singular", CASES)
def test_poisson_residual(cbc, c_or_f, singular):
    ng = (16, 12, 10)
    cfg = Config(ng=ng, l=(1.3, 0.9, 2.0), gtype=1, gr=0.8, dtype='float64')
    grid = make_grid(cfg.gtype, ng[2], cfg.gr, cfg.l[2])
    sv = make_solver(cfg, grid, cbc, c_or_f)

    rng = np.random.default_rng(42)
    rhs = rng.standard_normal((ng[2], ng[1], ng[0]))
    if singular:
        # discrete compatibility: the left null vector of the z-tridiagonal is
        # dzf-weighted (the physical divergence RHS satisfies this exactly)
        w = grid.dzf[1:ng[2] + 1]
        wmean = (rhs * w[:, None, None]).sum() / (w.sum() * ng[0] * ng[1])
        rhs = rhs - wmean

    p = np.asarray(solve(sv, jnp.asarray(rhs)))
    lap, (sz, sy, sx) = apply_lap3d(p, cbc, c_or_f, cfg, grid)
    res = lap - rhs[:sz, :sy, :sx]
    scale = max(np.abs(rhs).max(), 1.0)
    np.testing.assert_allclose(res / scale, 0.0, atol=1e-8)


def test_helmholtz_residual():
    """(I + alpha L) p = rhs, the Crank-Nicolson viscous solve
    (main.f90:424-443)."""
    ng = (16, 12, 10)
    cfg = Config(ng=ng, l=(1.0, 1.0, 2.0), gtype=1, gr=1.1, dtype='float64')
    grid = make_grid(cfg.gtype, ng[2], cfg.gr, cfg.l[2])
    cbc, c_or_f = ('PP', 'PP', 'DD'), ('f', 'c', 'c')
    sv = make_solver(cfg, grid, cbc, c_or_f)
    alpha = -0.37
    rng = np.random.default_rng(7)
    rhs = rng.standard_normal((ng[2], ng[1], ng[0]))
    p = np.asarray(solve(sv, jnp.asarray(rhs), alpha=alpha))
    lap, (sz, sy, sx) = apply_lap3d(p, cbc, c_or_f, cfg, grid)
    res = p[:sz, :sy, :sx] + alpha * lap - rhs[:sz, :sy, :sx]
    np.testing.assert_allclose(res, 0.0, atol=1e-10)


def test_poisson_periodic_z():
    """Tri-periodic with periodic tridiagonal path in z (gaussel_periodic)."""
    ng = (8, 8, 12)
    cfg = Config(ng=ng, l=(1.0, 1.0, 1.0), gtype=1, gr=0.0, dtype='float64')
    grid = make_grid(1, ng[2], 0.0, cfg.l[2])
    cbc, c_or_f = ('PP', 'PP', 'PP'), ('c', 'c', 'c')
    sv = make_solver(cfg, grid, cbc, c_or_f)
    rng = np.random.default_rng(3)
    rhs = rng.standard_normal((ng[2], ng[1], ng[0]))
    rhs -= rhs.mean()
    p = np.asarray(solve(sv, jnp.asarray(rhs)))
    lap, _ = apply_lap3d(p, cbc, c_or_f, cfg, grid)
    res = lap - rhs
    res -= res.mean()
    np.testing.assert_allclose(res, 0.0, atol=1e-9)


def test_eig_matches_thomas():
    """The MXU matrix-diagonalization z-solver must agree with the Thomas
    scan to machine precision (both paths kept; eig is the TPU default)."""
    ng = (16, 12, 10)
    cfg = Config(ng=ng, l=(1.3, 0.9, 2.0), gtype=1, gr=0.8, dtype='float64')
    grid = make_grid(cfg.gtype, ng[2], cfg.gr, cfg.l[2])
    rng = np.random.default_rng(5)
    rhs = rng.standard_normal((ng[2], ng[1], ng[0]))
    w = grid.dzf[1:ng[2] + 1]
    for cbc, cf in ((('PP', 'PP', 'NN'), ('c', 'c', 'c')),
                    (('PP', 'PP', 'PP'), ('c', 'c', 'c')),
                    (('PP', 'PP', 'DD'), ('c', 'c', 'f'))):
        if 'D' not in (cbc[2] + cbc[0] + cbc[1]):
            # compatible (dzf-weighted zero-mean) RHS: with an incompatible
            # RHS the eps-pivot (thomas) and null-space projection (eig)
            # legitimately differ in the singular column
            wm = (rhs * w[:, None, None]).sum() / (w.sum() * ng[0] * ng[1])
            r = rhs - wm
        else:
            r = rhs
        sv_e = make_solver(cfg, grid, cbc, cf, zsolver='eig')
        sv_t = make_solver(cfg, grid, cbc, cf, zsolver='thomas')
        pe = np.asarray(solve(sv_e, jnp.asarray(r)))
        pt = np.asarray(solve(sv_t, jnp.asarray(r)))
        if 'D' not in cbc[2] + cbc[0] + cbc[1]:
            pe = pe - pe.mean()
            pt = pt - pt.mean()
        np.testing.assert_allclose(pe, pt, atol=2e-9)


def test_pallas_solve_matches_xla(monkeypatch):
    """The 3-pass Pallas solve (ops/pallas_solve.py: fwd-y / z-eig+divide /
    bwd-y kernels, interpret mode) must reproduce poisson.solve exactly on
    the x-spectral in/out contract, for periodic and walled y/z."""
    monkeypatch.setenv('CALES_NO_PSOLVE_THOMAS', '1')   # pin the eig variant
    from cales_tpu.poisson import pallas_eligible
    ng = (128, 16, 24)    # (nx, ny, nz)
    rng = np.random.default_rng(7)
    rhs = jnp.asarray(rng.standard_normal((ng[2], ng[1], ng[0])))
    for cbc in (('PP', 'PP', 'NN'), ('PP', 'NN', 'NN'), ('PP', 'DD', 'NN'),
                ('PP', 'PP', 'PP')):
        cfg = Config(ng=ng, l=(1.3, 0.9, 2.0), gtype=1,
                     gr=0.8 if cbc[2] != 'PP' else 0.0,
                     dtype='float64', ptransform='mat')
        grid = make_grid(cfg.gtype, ng[2], cfg.gr, cfg.l[2])
        sv = make_solver(cfg, grid, cbc, ('c', 'c', 'c'))
        assert pallas_eligible(sv, (ng[2], ng[1], ng[0]), 8), cbc
        a = np.asarray(solve(sv, rhs, pre_xformed_x=True, skip_bwd_x=True))
        b = np.asarray(solve(sv, rhs, pre_xformed_x=True, skip_bwd_x=True,
                             pallas=True, pallas_interpret=True))
        if 'D' not in ''.join(cbc):
            a, b = a - a.mean(), b - b.mean()
        scale = np.abs(a).max()
        np.testing.assert_allclose(b, a, atol=1e-13 * scale, rtol=0)


def test_pallas_solve_full_transforms_matches_xla():
    """The generic aliased Pallas solve (no kernel x fusion: the x operator
    matmuls ride the y passes as flat in-kernel dots) must reproduce
    poisson.solve on PHYSICAL in/out for every baseline-class BC set —
    triperiodic, channel, duct, and cavity pressure systems."""
    ng = (128, 16, 24)
    rng = np.random.default_rng(17)
    rhs0 = rng.standard_normal((ng[2], ng[1], ng[0]))
    for cbc in (('PP', 'PP', 'PP'), ('PP', 'PP', 'NN'), ('PP', 'NN', 'NN'),
                ('NN', 'NN', 'NN')):
        cfg = Config(ng=ng, l=(1.3, 0.9, 2.0), gtype=1,
                     gr=0.8 if cbc[2] != 'PP' else 0.0,
                     dtype='float64', ptransform='mat')
        grid = make_grid(cfg.gtype, ng[2], cfg.gr, cfg.l[2])
        sv = make_solver(cfg, grid, cbc, ('c', 'c', 'c'))
        from cales_tpu.poisson import pallas_eligible
        assert pallas_eligible(sv, (ng[2], ng[1], ng[0]), 8), cbc
        # compatible RHS (physical space): zero dzf-weighted mean
        w = grid.dzf[1:ng[2] + 1]
        wm = (rhs0 * w[:, None, None]).sum() / (w.sum() * ng[0] * ng[1])
        rhs = jnp.asarray(rhs0 - wm)
        a = np.asarray(solve(sv, rhs))
        b = np.asarray(solve(sv, rhs, pallas=True, pallas_interpret=True))
        a, b = a - a.mean(), b - b.mean()
        scale = np.abs(a).max()
        np.testing.assert_allclose(b, a, atol=2e-11 * scale, rtol=0,
                                   err_msg=str(cbc))


def test_pallas_helmholtz_3d_matches_xla():
    """The aliased Pallas Helmholtz pipeline (solve with alpha: transforms
    fused into the y passes + alpha-scaled Thomas z, qz tail passthrough)
    must reproduce poisson.solve for the three velocity stagger classes of
    the full-3D implicit-diffusion path (main.f90:423-443)."""
    from cales_tpu.poisson import pallas_helmholtz_eligible
    ng = (128, 16, 24)
    rng = np.random.default_rng(19)
    rhs = jnp.asarray(rng.standard_normal((ng[2], ng[1], ng[0])))
    cfg = Config(ng=ng, l=(1.3, 0.9, 2.0), gtype=1, gr=0.8,
                 dtype='float64', ptransform='mat')
    grid = make_grid(cfg.gtype, ng[2], cfg.gr, cfg.l[2])
    for cbc, cf in ((('PP', 'PP', 'DD'), ('f', 'c', 'c')),
                    (('PP', 'PP', 'DD'), ('c', 'c', 'f')),   # qz=1 w solve
                    (('PP', 'PP', 'PP'), ('c', 'c', 'c'))):
        g = grid if cbc[2] != 'PP' else make_grid(1, ng[2], 0.0, cfg.l[2])
        sv = make_solver(cfg, g, cbc, cf)
        assert pallas_helmholtz_eligible(sv, (ng[2], ng[1], ng[0]), 8), cbc
        alpha = -0.021
        a = np.asarray(solve(sv, rhs, alpha=alpha))
        b = np.asarray(solve(sv, rhs, alpha=alpha, pallas=True,
                             pallas_interpret=True))
        np.testing.assert_allclose(b, a, atol=1e-12 * np.abs(a).max(),
                                   rtol=0, err_msg=str((cbc, cf)))


def test_pallas_helmholtz_z_matches_xla():
    """solve_z_only's aliased Pallas Thomas pass (the _IMPDIFF_1D CN solve,
    solver.f90:182-233) must reproduce the XLA path at machine precision —
    both c- and f-staggered z (the qz=1 truncated w solve)."""
    from cales_tpu.poisson import solve_z_only
    ng = (128, 16, 24)
    rng = np.random.default_rng(13)
    rhs = jnp.asarray(rng.standard_normal((ng[2], ng[1], ng[0])))
    cfg = Config(ng=ng, l=(1.3, 0.9, 2.0), gtype=1, gr=0.8,
                 dtype='float64', ptransform='mat')
    grid = make_grid(cfg.gtype, ng[2], cfg.gr, cfg.l[2])
    for cbc, cf in ((('PP', 'PP', 'DD'), ('c', 'c', 'c')),
                    (('PP', 'PP', 'DD'), ('c', 'c', 'f')),
                    (('PP', 'PP', 'ND'), ('c', 'c', 'c'))):
        sv = make_solver(cfg, grid, cbc, cf)
        alpha = -0.043
        a = np.asarray(solve_z_only(sv, rhs, alpha))
        b = np.asarray(solve_z_only(sv, rhs, alpha, pallas=True,
                                    pallas_interpret=True))
        np.testing.assert_allclose(b, a, atol=1e-12 * np.abs(a).max(),
                                   rtol=0, err_msg=str((cbc, cf)))


def test_helmholtz_z_shift_matches_pre_add():
    """solve_z_only(shift=f) (the folded bulk-forcing add of the CN-fold
    path, rk.f90:197-222 + main.f90:423-431 ordering) must equal adding f
    to the RHS field before the solve — XLA and Pallas branches, incl. the
    qz=1 face-staggered passthrough tail."""
    from cales_tpu.poisson import solve_z_only
    ng = (96, 12, 16)
    rng = np.random.default_rng(7)
    rhs = jnp.asarray(rng.standard_normal((ng[2], ng[1], ng[0])))
    cfg = Config(ng=ng, l=(1.3, 0.9, 2.0), gtype=1, gr=0.8,
                 dtype='float64', ptransform='mat')
    grid = make_grid(cfg.gtype, ng[2], cfg.gr, cfg.l[2])
    f = 0.0173
    for cbc, cf in ((('PP', 'PP', 'DD'), ('c', 'c', 'c')),
                    (('PP', 'PP', 'DD'), ('c', 'c', 'f'))):
        sv = make_solver(cfg, grid, cbc, cf)
        alpha = -0.043
        for pallas in (False, True):
            a = np.asarray(solve_z_only(sv, rhs + f, alpha, pallas=pallas,
                                        pallas_interpret=pallas))
            b = np.asarray(solve_z_only(sv, rhs, alpha, pallas=pallas,
                                        pallas_interpret=pallas,
                                        shift=jnp.asarray(f)))
            np.testing.assert_allclose(b, a, atol=1e-13 * np.abs(a).max(),
                                       rtol=0,
                                       err_msg=str((cbc, cf, pallas)))


def test_pallas_solve_thomas_matches_xla(monkeypatch):
    """The opt-in aliased V1 pipeline (default for non-periodic z: in-place y
    passes + in-kernel eps-regularized Thomas z sweep) must agree with the
    eig-based poisson.solve up to the pressure gauge — the eig path
    PROJECTS the singular constant mode out while Thomas regularizes the
    pivots (the reference dgtsv_homebrewed, solver.f90:153-179), so the
    comparison is mean-subtracted."""
    monkeypatch.delenv('CALES_NO_PSOLVE_THOMAS', raising=False)
    from cales_tpu.poisson import pallas_eligible
    ng = (128, 16, 24)    # (nx, ny, nz)
    rng = np.random.default_rng(11)
    rhs0 = rng.standard_normal((ng[2], ng[1], ng[0]))
    for cbc in (('PP', 'PP', 'NN'), ('PP', 'NN', 'NN'), ('PP', 'DD', 'ND')):
        cfg = Config(ng=ng, l=(1.3, 0.9, 2.0), gtype=1, gr=0.8,
                     dtype='float64', ptransform='mat')
        grid = make_grid(cfg.gtype, ng[2], cfg.gr, cfg.l[2])
        sv = make_solver(cfg, grid, cbc, ('c', 'c', 'c'))
        assert pallas_eligible(sv, (ng[2], ng[1], ng[0]), 8), cbc
        if 'D' not in ''.join(cbc):
            # compatible RHS: pinning and eig-projection agree (up to the
            # gauge) only for a consistent singular system.  The input is
            # x-SPECTRAL, so zero the (z, y) dzf-weighted mean per column
            # (the singular lane is (ky=0, kx=0) inside its own column)
            w = grid.dzf[1:ng[2] + 1][:, None, None]
            wm = (rhs0 * w).sum(axis=(0, 1), keepdims=True) \
                / (w.sum() * ng[1])
            rhs = jnp.asarray(rhs0 - wm)
        else:
            rhs = jnp.asarray(rhs0)
        a = np.asarray(solve(sv, rhs, pre_xformed_x=True, skip_bwd_x=True))
        b = np.asarray(solve(sv, rhs, pre_xformed_x=True, skip_bwd_x=True,
                             pallas=True, pallas_interpret=True))
        if 'D' not in ''.join(cbc):
            # the outputs are x-SPECTRAL: a physical-space gauge constant
            # (projection vs pinning) lives in the kx=0 column only, so
            # remove the per-column (z, y) mean rather than the array mean
            a = a - a.mean(axis=(0, 1), keepdims=True)
            b = b - b.mean(axis=(0, 1), keepdims=True)
        scale = np.abs(a).max()
        np.testing.assert_allclose(b, a, atol=1e-11 * scale, rtol=0,
                                   err_msg=str(cbc))
