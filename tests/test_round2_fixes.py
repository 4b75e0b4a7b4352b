"""Round-2 fix coverage: scalar checkpoint sidecar, BC-exact statistics wall
planes, masked divergence check, out3d decimation, hwm band validation for
x/y walls, time_max chunking, eig-solver complex-spectrum guard."""
import math
import warnings
from pathlib import Path

import numpy as np
import pytest

from cales_tpu.config import Config
from cales_tpu.grid import make_grid_from_config
from cales_tpu.io import checkpoint as ckpt
from cales_tpu.io import stats


def test_scalar_restart_continuation(tmp_path):
    """4 steps straight vs 2 + (fld.bin + scal.bin sidecar) restart + 2:
    scalar field must agree exactly (load.f90:20-153 completeness contract
    extended to the opt-in scalar)."""
    from cales_tpu.initflow import initflow
    from cales_tpu.timeloop import Simulation

    cfg = Config(ng=(12, 8, 8), l=(2 * np.pi, np.pi, 2.0), visci=200.0,
                 inivel='log', is_wallturb=True, dtype='float64',
                 is_forced=(True, False, False), velf=(1.0, 0.0, 0.0),
                 scalar=True, iniscal='uni', pr=0.7)
    grid = make_grid_from_config(cfg)
    sim = Simulation(cfg, grid)
    s0 = sim.initial_state(*initflow(cfg, grid))
    dt = 1e-3

    sA = s0
    for _ in range(4):
        sA, _ = sim.step(sA, dt)

    sB = s0
    for _ in range(2):
        sB, _ = sim.step(sB, dt)
    ckpt.save_checkpoint(tmp_path / 'fld.bin', np.asarray(sB.u),
                         np.asarray(sB.v), np.asarray(sB.w),
                         np.asarray(sB.p), float(sB.time), int(sB.istep))
    ckpt.save_scalar(tmp_path / 'scal.bin', np.asarray(sB.s),
                     float(sB.time), int(sB.istep))

    u, v, w, p, t, i = ckpt.load_checkpoint(tmp_path / 'fld.bin', cfg.ng,
                                            np.float64)
    s, ts, js = ckpt.load_scalar(tmp_path / 'scal.bin', cfg.ng, np.float64)
    assert ts == t and js == i
    sC = sim.initial_state(u, v, w, p)
    import jax.numpy as jnp
    sC = sC._replace(s=jnp.asarray(s), time=sC.time + t, istep=sC.istep + i)
    for _ in range(2):
        sC, _ = sim.step(sC, dt)
    np.testing.assert_allclose(np.asarray(sC.s), np.asarray(sA.s), atol=1e-13)
    np.testing.assert_allclose(np.asarray(sC.u), np.asarray(sA.u), atol=1e-13)


def test_scalar_restart_requires_sidecar(tmp_path):
    """driver.run must refuse restart+scalar without scal.bin."""
    from cales_tpu import driver
    cfg = Config(ng=(8, 8, 8), l=(1., 1., 1.), visci=100.0, scalar=True,
                 restart=True, dtype='float64', nstep=1,
                 stop_type=(True, False, False))
    # a velocity checkpoint exists, the scalar sidecar does not
    z = np.zeros((8, 8, 8))
    ckpt.save_checkpoint(tmp_path / 'fld.bin', z, z, z, z, 0.0, 0)
    with pytest.raises(FileNotFoundError, match='scal.bin'):
        driver.run(cfg, datadir=tmp_path, verbose=False)


def test_stats_wall_plane_dirichlet_shear(tmp_path):
    """<du/dz> at the top wall face must be computed through the solver's
    Dirichlet ghost (u(n+1) = 2*bc - u(n)), not edge replication (which
    reports 0 shear at zf(n)) — output.f90:540-700 semantics."""
    cfg = Config(ng=(8, 6, 16), l=(1., 1., 2.), gtype=0, dtype='float64')
    grid = make_grid_from_config(cfg)
    nz, ny, nx = 16, 6, 8
    zc = grid.zc[1:nz + 1]
    # u = z(2-z): parabola with u=0 at both walls
    u = np.broadcast_to((zc * (2 - zc))[:, None, None], (nz, ny, nx)).copy()
    v = np.zeros((nz, ny, nx))
    w = np.zeros((nz, ny, nx))
    p = np.zeros((nz, ny, nx))
    s = np.zeros((nz, ny, nx))
    out = stats.single_point_chan(tmp_path / 'st', cfg, grid, u, v, w, p, s)
    dudz = out[26]
    dzc = grid.dzc
    # top wall: ghost u = 2*0 - u(n) -> dudz = -2 u(n)/dzc(n)
    exp_top = (0.0 - u[-1, 0, 0]) * 2.0 / dzc[nz]
    exp_bot_interior = (u[1, 0, 0] - u[0, 0, 0]) / dzc[1]
    np.testing.assert_allclose(dudz[-1], exp_top, rtol=1e-12)
    np.testing.assert_allclose(dudz[0], exp_bot_interior, rtol=1e-12)
    # edge replication would have given exactly 0 at the top face
    assert abs(dudz[-1]) > 0.1


def test_masked_divergence():
    """mask excludes the boundary cell planes of non-periodic directions
    (_MASK_DIVERGENCE_CHECK)."""
    import jax.numpy as jnp
    from cales_tpu.ops.stencil import divergence
    nz, ny, nx = 4, 4, 6
    up = jnp.zeros((nz + 2, ny + 2, nx + 2))
    vp = jnp.zeros_like(up)
    wp = jnp.zeros_like(up)
    # a spurious source only in the last x cell layer (outflow column)
    up = up.at[1:-1, 1:-1, -2].set(1.0)
    dzfi = np.ones(nz + 2)
    _, divmax = divergence(up, vp, wp, 1.0, 1.0, dzfi)
    assert float(divmax) > 0.5
    _, divmax_m = divergence(up, vp, wp, 1.0, 1.0, dzfi,
                             mask=(True, False, False))
    assert float(divmax_m) < 1e-14


def test_out3d_nskip(tmp_path):
    from cales_tpu.io.output import write_field_bin
    f = np.arange(4 * 6 * 8, dtype=np.float64).reshape(4, 6, 8)
    fn = tmp_path / 'f.bin'
    write_field_bin(fn, f, nskip=(2, 3, 1))    # logical (x, y, z)
    got = np.fromfile(fn).reshape(4, 2, 4)
    np.testing.assert_array_equal(got, f[::1, ::3, ::2])


def test_hwm_band_check_xy_walls():
    """find_index_wm must reject hwm beyond the first..last cell-center band
    in x/y too (sanity.f90:233-241), instead of walking out of the grid."""
    from cales_tpu.wallmodel import find_index_wm
    v = (('D', 'P', 'D'),) * 3
    cfg = Config(ng=(16, 16, 16), l=(1., 1., 1.), cbcvel=(v, v),
                 cbcpre=(('N', 'P', 'N'), ('N', 'P', 'N')),
                 lwm=((1, 0, 0), (1, 0, 0)), hwm=0.99)
    grid = make_grid_from_config(cfg)
    with pytest.raises(ValueError, match='direction x'):
        find_index_wm(cfg, grid)
    cfg2 = cfg.replace(hwm=0.12)
    idx = find_index_wm(cfg2, grid)
    assert idx[0][0] == 3 and idx[0][1] == 14


def test_time_max_stopping_exact(tmp_path):
    """time_max runs stop at the right step without the per-step dispatch
    cliff (driver chunk prediction)."""
    from cales_tpu import driver
    cfg = Config(ng=(8, 8, 8), l=(2 * np.pi,) * 3, visci=100.0, inivel='tgv',
                 cbcvel=((('P',) * 3,) * 3, (('P',) * 3,) * 3),
                 cbcpre=(('P',) * 3, ('P',) * 3),
                 cbcsgs=(('P',) * 3, ('P',) * 3),
                 dt_f=1e-3, time_max=0.0123,
                 stop_type=(False, True, False),
                 icheck=4, iout0d=4, iout1d=0, iout2d=0, iout3d=0, isave=0,
                 dtype='float64')
    sim, state = driver.run(cfg, datadir=tmp_path, verbose=False)
    nsteps = int(state.istep)
    assert nsteps == math.ceil(0.0123 / 1e-3)    # 13 steps
    assert float(state.time) >= 0.0123


def test_eig_complex_spectrum_raises_and_solver_falls_back(monkeypatch):
    """A z operator with a genuinely complex eigendecomposition must raise
    (never silently truncate complex eigenvectors), and make_solver must fall
    back to the Thomas z-solver in that case."""
    from cales_tpu import poisson
    # rotation-like periodic operator: cycle product < 0 -> complex spectrum
    n = 8
    a = np.ones(n)
    c = -np.ones(n)
    b = np.zeros(n)
    with pytest.raises(ValueError, match='complex'):
        poisson._z_eigendecomposition(a, b, c, np.ones(n + 2), True)

    # non-symmetric (one-end-stretched) periodic z still has a real spectrum
    # and must solve correctly through the general fallback
    cfg = Config(ng=(8, 8, 12), l=(1., 1., 1.), gtype=2, gr=1.5,
                 dtype='float64')
    grid = make_grid_from_config(cfg)
    sv = poisson.make_solver(cfg, grid, ('PP', 'PP', 'PP'), ('c', 'c', 'c'),
                             zsolver='eig')
    assert sv.zsolver == 'eig' and sv.zVl is not None

    # make_solver falls back to thomas when the eigendecomposition refuses
    def boom(*a, **kw):
        raise ValueError('complex eigendecomposition')
    monkeypatch.setattr(poisson, '_z_eigendecomposition', boom)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter('always')
        sv2 = poisson.make_solver(cfg, grid, ('PP', 'PP', 'PP'),
                                  ('c', 'c', 'c'), zsolver='eig')
    assert sv2.zsolver == 'thomas'
    assert any('thomas' in str(w.message) for w in rec)
