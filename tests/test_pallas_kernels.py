"""Pallas mega-kernel parity vs the XLA expression path (interpret mode on
CPU; the formulas are shared via stencil.momentum_rhs_core /
strain_rate_core, so agreement must be bitwise up to roll-vs-slice
equivalence).

Kernel input protocol: interior (nz, ny, nx) arrays + (3, ny, nx) z-edge
stacks [padded row 0, padded row nz, padded row nz+1] (boundary.zedge_*);
the padded row nz slot carries set_bc's wall-face rewrite for the staggered
component, so the kernels never read the interior's last z row directly."""
import numpy as np
import jax.numpy as jnp

from cales_tpu.config import Config
from cales_tpu.grid import make_grid_from_config
from cales_tpu.ops import stencil as st
from cales_tpu.ops.pallas_kernels import (fused_mom_rk, fused_smag,
                                          fused_fillps, fused_correc_updatep)


def _rand_field_edges(rng, nz, ny, nx, rewrite_last=False):
    """(interior, zedge, padded-reference) with random ghosts; if
    rewrite_last, padded row nz differs from the interior last row (the
    set_bc wall-face rewrite slot)."""
    interior = rng.standard_normal((nz, ny, nx))
    glo = rng.standard_normal((ny, nx))
    ghi = rng.standard_normal((ny, nx))
    row_nz = rng.standard_normal((ny, nx)) if rewrite_last else interior[-1]
    zedge = jnp.asarray(np.stack([glo, row_nz, ghi]))
    padded = np.concatenate([glo[None], interior[:-1], row_nz[None],
                             ghi[None]], axis=0)
    return jnp.asarray(interior), zedge, padded


def _wrap_xy(zq):
    """full-padded view of a z-padded (nz+2, ny, nx) array with periodic
    x/y ghosts (what the kernel's wrap DMAs + rolls implement)."""
    a = np.asarray(zq)
    a = np.concatenate([a[:, -1:, :], a, a[:, :1, :]], axis=1)
    a = np.concatenate([a[:, :, -1:], a, a[:, :, :1]], axis=2)
    return jnp.asarray(a)


def test_fused_mom_rk_matches_xla():
    ng = (128, 32, 16)    # (nx, ny, nz): nx mult of 128, ny mult of 8
    cfg = Config(ng=ng, l=(2 * np.pi, np.pi, 2.0), gtype=1, gr=1.0,
                 dtype='float64')
    grid = make_grid_from_config(cfg)
    nx, ny, nz = ng
    rng = np.random.default_rng(0)
    u, ue, upad = _rand_field_edges(rng, nz, ny, nx)
    v, ve, vpad = _rand_field_edges(rng, nz, ny, nx)
    w, we, wpad = _rand_field_edges(rng, nz, ny, nx, rewrite_last=True)
    s, se, spad = _rand_field_edges(rng, nz, ny, nx)
    p, pe, ppad_z = _rand_field_edges(rng, nz, ny, nx)
    ruo, rvo, rwo = (jnp.asarray(rng.standard_normal((nz, ny, nx)))
                     for _ in range(3))
    f1, f2, visc = 0.5e-3, -0.2e-3, 0.01
    dxi, dyi = float(ng[0] / cfg.l[0]), float(ng[1] / cfg.l[1])
    bforce = (0.1, 0.0, 0.0)

    out = fused_mom_rk(u, v, w, s, p, ue, ve, we, se, pe, ruo, rvo, rwo,
                       grid.dzci, grid.dzfi, f1, f2, visc, dxi, dyi,
                       bforce, interpret=True)
    assert out is not None
    u_n, v_n, w_n, ru, rv, rw = out

    up, vp, wp, sp, ppad = map(_wrap_xy, (upad, vpad, wpad, spad, ppad_z))
    (eu, exy, ez), (ev, exyv, ezv), (ew, exyw, ezw) = st.momentum_rhs(
        up, vp, wp, sp, visc, dxi, dyi, grid.dzci, grid.dzfi)
    f12 = f1 + f2
    pc = ppad[1:-1, 1:-1, 1:-1]
    u_ref = up[1:-1, 1:-1, 1:-1] + f1 * (eu + exy + ez) + f2 * ruo \
        + f12 * (bforce[0] - dxi * (ppad[1:-1, 1:-1, 2:] - pc))
    v_ref = vp[1:-1, 1:-1, 1:-1] + f1 * (ev + exyv + ezv) + f2 * rvo \
        + f12 * (bforce[1] - dyi * (ppad[1:-1, 2:, 1:-1] - pc))
    w_ref = wp[1:-1, 1:-1, 1:-1] + f1 * (ew + exyw + ezw) + f2 * rwo \
        + f12 * (bforce[2] - grid.dzci[1:nz + 1][:, None, None]
                 * (ppad[2:, 1:-1, 1:-1] - pc))
    np.testing.assert_allclose(np.asarray(u_n), np.asarray(u_ref), atol=1e-13)
    np.testing.assert_allclose(np.asarray(v_n), np.asarray(v_ref), atol=1e-13)
    np.testing.assert_allclose(np.asarray(w_n), np.asarray(w_ref), atol=1e-13)
    np.testing.assert_allclose(np.asarray(ru), np.asarray(eu + exy + ez),
                               atol=1e-11)
    np.testing.assert_allclose(np.asarray(rw), np.asarray(ew + exyw + ezw),
                               atol=1e-11)


def test_fused_fillps_matches_xla():
    ng = (128, 32, 16)
    cfg = Config(ng=ng, l=(2 * np.pi, np.pi, 2.0), gtype=1, gr=0.8,
                 dtype='float64')
    grid = make_grid_from_config(cfg)
    nx, ny, nz = ng
    rng = np.random.default_rng(3)
    u, ue, upad = _rand_field_edges(rng, nz, ny, nx)
    v, ve, vpad = _rand_field_edges(rng, nz, ny, nx)
    w, we, wpad = _rand_field_edges(rng, nz, ny, nx, rewrite_last=True)
    dti = 1.0 / 2.3e-3
    dxi, dyi = float(ng[0] / cfg.l[0]), float(ng[1] / cfg.l[1])
    out = fused_fillps(u, v, w, ue, ve, we, grid.dzfi, dti, dxi, dyi,
                       interpret=True)
    assert out is not None
    up, vp, wp = map(_wrap_xy, (upad, vpad, wpad))
    ref = st.fillps(up, vp, wp, dti, dxi, dyi, grid.dzfi)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-12)


def test_fused_correc_updatep_matches_xla():
    ng = (128, 32, 16)
    cfg = Config(ng=ng, l=(2 * np.pi, np.pi, 2.0), gtype=1, gr=0.8,
                 dtype='float64')
    grid = make_grid_from_config(cfg)
    nx, ny, nz = ng
    rng = np.random.default_rng(4)
    u, ue, upad = _rand_field_edges(rng, nz, ny, nx)
    v, ve, vpad = _rand_field_edges(rng, nz, ny, nx)
    w, we, wpad = _rand_field_edges(rng, nz, ny, nx, rewrite_last=True)
    pp, ppe, pppad_z = _rand_field_edges(rng, nz, ny, nx)
    p = jnp.asarray(rng.standard_normal((nz, ny, nx)))
    dtrk = 3.7e-3
    dxi, dyi = float(ng[0] / cfg.l[0]), float(ng[1] / cfg.l[1])

    out = fused_correc_updatep(u, v, w, pp, p, we, ppe, dtrk, dxi, dyi,
                               grid.dzci, interpret=True)
    assert out is not None
    u_n, v_n, w_n, p_n = out

    up, vp, wp, pppad = map(_wrap_xy, (upad, vpad, wpad, pppad_z))
    u_ref, v_ref, w_ref, vlo = st.correc(up, vp, wp, pppad, dtrk, dxi, dyi,
                                         grid.dzci)
    p_ref = st.updatep(pppad, p, None, False, False, dxi, dyi,
                       grid.dzci, grid.dzfi)
    np.testing.assert_allclose(np.asarray(u_n), np.asarray(u_ref), atol=1e-13)
    np.testing.assert_allclose(np.asarray(v_n), np.asarray(v_ref), atol=1e-13)
    np.testing.assert_allclose(np.asarray(w_n), np.asarray(w_ref), atol=1e-13)
    np.testing.assert_allclose(np.asarray(p_n), np.asarray(p_ref), atol=1e-13)
    # the caller's plane-sized vlo_z update must match the padded sweep
    wlo = np.asarray(we)[0] - dtrk * float(grid.dzci[0]) \
        * (np.asarray(pp)[0] - np.asarray(ppe)[0])
    wlo = np.concatenate([wlo[-1:], wlo, wlo[:1]], axis=0)
    wlo = np.concatenate([wlo[:, -1:], wlo, wlo[:, :1]], axis=1)
    np.testing.assert_allclose(wlo, np.asarray(vlo[2]), atol=1e-13)


def test_fused_smag_matches_xla_channel():
    """van Driest static Smagorinsky on a channel (z walls): kernel vs the
    sgs.smag_visct XLA path."""
    from cales_tpu import sgs as sgsmod
    from cales_tpu.config import effective_cbcvel, C_SMAG

    ng = (128, 32, 16)
    cfg = Config(ng=ng, l=(2 * np.pi, np.pi, 2.0), gtype=1, gr=0.9,
                 visci=1000.0, dtype='float64',
                 cbcvel=((('P', 'P', 'P'), ('P', 'P', 'P'),
                          ('D', 'D', 'D')),) * 2,
                 cbcpre=(('P', 'P', 'N'), ('P', 'P', 'N')),
                 cbcsgs=(('P', 'P', 'N'), ('P', 'P', 'N')))
    grid = make_grid_from_config(cfg)
    nx, ny, nz = ng
    rng = np.random.default_rng(1)
    u, ue, upad = _rand_field_edges(rng, nz, ny, nx)
    v, ve, vpad = _rand_field_edges(rng, nz, ny, nx)
    w, we, wpad = _rand_field_edges(rng, nz, ny, nx, rewrite_last=True)
    up, vp, wp = map(_wrap_xy, (upad, vpad, wpad))

    setup = sgsmod.SGSSetup(cfg, grid, effective_cbcvel(cfg))
    ref = sgsmod.smag_visct(setup, cfg, grid, up, vp, wp)

    # kernel-path auxiliary inputs (what timeloop computes)
    dxi, dyi = cfg.dli[0], cfg.dli[1]
    tauw6 = sgsmod._wall_tauw_planes(setup, up, vp, wp, dxi, dyi,
                                     grid.dzci, cfg.visc)
    tauw_lo = tauw6[4][0]          # (ny, nx)
    tauw_hi = tauw6[5][0]
    zc = grid.zc[1:nz + 1]
    dw_lo, dw_hi = zc, cfg.l[2] - zc
    nearlo = (dw_lo <= dw_hi).astype(np.float64)
    dw_1d = np.minimum(dw_lo, dw_hi)
    csd2 = (C_SMAG * setup.delta) ** 2

    out = fused_smag(u, v, w, ue, ve, we, grid.dzci, grid.dzfi, dxi, dyi,
                     cfg.visc, csd2, dw_1d=dw_1d, nearlo_1d=nearlo,
                     tauw_lo=tauw_lo, tauw_hi=tauw_hi, interpret=True)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-14)


def test_fused_smag_no_walls():
    """Tri-periodic: fd == 1, nu_t = (Cs Delta)^2 |S|."""
    from cales_tpu import sgs as sgsmod
    from cales_tpu.config import effective_cbcvel, C_SMAG

    ng = (128, 16, 8)
    P3 = (('P',) * 3,) * 3
    cfg = Config(ng=ng, l=(1., 1., 1.), visci=100.0, dtype='float64',
                 cbcvel=(P3, P3), cbcpre=(('P',) * 3, ('P',) * 3),
                 cbcsgs=(('P',) * 3, ('P',) * 3))
    grid = make_grid_from_config(cfg)
    nx, ny, nz = ng
    rng = np.random.default_rng(2)
    # periodic z: edge stacks are wrap rows
    ui = [rng.standard_normal((nz, ny, nx)) for _ in range(3)]
    zedge = lambda a: jnp.asarray(np.stack([a[-1], a[-1], a[0]]))
    zpad = lambda a: jnp.asarray(np.concatenate([a[-1:], a, a[:1]], axis=0))
    u, v, w = map(jnp.asarray, ui)
    ue, ve, we = map(zedge, ui)
    up, vp, wp = map(_wrap_xy, map(zpad, ui))

    setup = sgsmod.SGSSetup(cfg, grid, effective_cbcvel(cfg))
    ref = sgsmod.smag_visct(setup, cfg, grid, up, vp, wp)
    csd2 = (C_SMAG * setup.delta) ** 2
    out = fused_smag(u, v, w, ue, ve, we, grid.dzci, grid.dzfi, cfg.dli[0],
                     cfg.dli[1], cfg.visc, csd2, interpret=True)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-14)


def test_zedge_matches_zpad():
    """zedge_* stacks must agree row-for-row with the zpad_* padded rows."""
    from cales_tpu.ops import boundary as bnd
    from cales_tpu.config import effective_cbcvel

    cfg = Config(ng=(16, 8, 8), l=(2 * np.pi, np.pi, 2.0), gtype=1, gr=0.7,
                 dtype='float64',
                 cbcvel=((('P', 'P', 'D'),) * 3, (('P', 'P', 'N'),) * 3),
                 cbcpre=(('P', 'P', 'N'), ('P', 'P', 'N')),
                 cbcsgs=(('P', 'P', 'N'), ('P', 'P', 'N')))
    grid = make_grid_from_config(cfg)
    cbcvel = effective_cbcvel(cfg)
    rng = np.random.default_rng(5)
    u, v, w = (jnp.asarray(rng.standard_normal((8, 8, 16))) for _ in range(3))
    bc0 = ((0.0, 0.0), (0.0, 0.0), (0.3, -0.2))
    for is_correc, vlo in ((False, None),
                           (True, (None, None,
                                   jnp.asarray(rng.standard_normal((10, 18)))))):
        uq, vq, wq = bnd.zpad_velocity(u, v, w, cbcvel, bc0, bc0, bc0,
                                       grid.dzc, grid.dzf, vlo=vlo,
                                       is_correc=is_correc)
        ue, ve, we = bnd.zedge_velocity(u, v, w, cbcvel, bc0, bc0, bc0,
                                        grid.dzc, grid.dzf, vlo=vlo,
                                        is_correc=is_correc)
        for q, e in ((uq, ue), (vq, ve), (wq, we)):
            np.testing.assert_allclose(np.asarray(e),
                                       np.asarray(jnp.stack([q[0], q[-2],
                                                             q[-1]])),
                                       atol=0)
    # scalar
    pfield = jnp.asarray(rng.standard_normal((8, 8, 16)))
    pq = bnd.zpad_scalar(pfield, ('N', 'N'), (0.0, 0.0), grid.dzc)
    pe = bnd.zedge_scalar(pfield, ('N', 'N'), (0.0, 0.0), grid.dzc)
    np.testing.assert_allclose(np.asarray(pe),
                               np.asarray(jnp.stack([pq[0], pq[-2], pq[-1]])),
                               atol=0)


def test_pallas_step_integration_matches_xla(monkeypatch):
    """Full Simulation steps with the Pallas kernel path (interpret mode)
    vs the XLA expression path: channel LES, 3 steps, near-bitwise."""
    monkeypatch.setenv('CALES_PALLAS_INTERPRET', '1')
    from cales_tpu.initflow import initflow
    from cales_tpu.timeloop import Simulation

    base = dict(ng=(128, 16, 16), l=(2 * np.pi, np.pi, 2.0), gtype=1, gr=0.9,
                visci=2000.0, inivel='log', is_wallturb=True, dtype='float64',
                is_forced=(True, False, False), velf=(1.0, 0.0, 0.0),
                sgstype='smag')
    cfgs = [Config(**base, use_pallas=False), Config(**base, use_pallas=True)]
    results = []
    for cfg in cfgs:
        grid = make_grid_from_config(cfg)
        sim = Simulation(cfg, grid)
        if cfg.use_pallas:
            assert sim.use_pallas_mom and sim.use_pallas_smag
        s = sim.initial_state(*initflow(cfg, grid))
        for _ in range(3):
            s, _ = sim.step(s, 1e-3)
        results.append(s)
    a, b = results
    np.testing.assert_allclose(np.asarray(b.u), np.asarray(a.u), atol=1e-12)
    np.testing.assert_allclose(np.asarray(b.v), np.asarray(a.v), atol=1e-12)
    np.testing.assert_allclose(np.asarray(b.w), np.asarray(a.w), atol=1e-12)
    np.testing.assert_allclose(np.asarray(b.p), np.asarray(a.p), atol=1e-11)
    np.testing.assert_allclose(np.asarray(b.visct), np.asarray(a.visct),
                               atol=1e-13)


def test_pallas_step_integration_wmles(monkeypatch):
    """Kernel path on a wall-modeled channel (log-law z walls): exercises the
    lwm z extrapolation swap + wall-model Neumann planes through the edge
    stacks."""
    monkeypatch.setenv('CALES_PALLAS_INTERPRET', '1')
    from cales_tpu.initflow import initflow
    from cales_tpu.timeloop import Simulation

    base = dict(ng=(128, 16, 16), l=(12.8, 4.8, 2.0), gtype=6, visci=125000.0,
                inivel='poi', is_wallturb=True, dtype='float64',
                is_forced=(True, False, False), velf=(1.0, 0.0, 0.0),
                sgstype='smag', lwm=((0, 0, 1), (0, 0, 1)), hwm=0.1,
                cbcvel=((('P', 'P', 'P'), ('P', 'P', 'P'),
                         ('D', 'D', 'D')),) * 2,
                cbcpre=(('P', 'P', 'N'), ('P', 'P', 'N')),
                cbcsgs=(('P', 'P', 'N'), ('P', 'P', 'N')))
    results = []
    for up_ in (False, True):
        cfg = Config(**base, use_pallas=up_)
        grid = make_grid_from_config(cfg)
        sim = Simulation(cfg, grid)
        s = sim.initial_state(*initflow(cfg, grid))
        for _ in range(2):
            s, _ = sim.step(s, 1e-3)
        results.append(s)
    a, b = results
    np.testing.assert_allclose(np.asarray(b.u), np.asarray(a.u), atol=1e-12)
    np.testing.assert_allclose(np.asarray(b.w), np.asarray(a.w), atol=1e-12)
    np.testing.assert_allclose(np.asarray(b.visct), np.asarray(a.visct),
                               atol=1e-13)


def test_pallas_step_integration_duct_wmles(monkeypatch):
    """Kernel path on a wall-modeled square duct (log-law wall model on all
    four y/z side walls, examples/turbulent_duct_wmles class): the y-edge
    bundles carry the wall-model-updated Neumann planes (plane-valued
    _yrows/_zedge_of_yrows corner rows) and the momentum/fillps/correc
    kernels consume them; smag stays on the XLA fallback (walls_z_only is
    False).  Parity vs the all-XLA path."""
    monkeypatch.setenv('CALES_PALLAS_INTERPRET', '1')
    from cales_tpu.initflow import initflow
    from cales_tpu.timeloop import Simulation

    base = dict(ng=(128, 16, 16), l=(12.8, 2.0, 2.0), gtype=1, gr=0.0,
                visci=20000.0, inivel='duc', is_wallturb=True,
                dtype='float64', is_forced=(True, False, False),
                velf=(1.0, 0.0, 0.0), sgstype='smag', hwm=0.2,
                lwm=((0, 1, 1), (0, 1, 1)),
                cbcvel=((('P', 'P', 'P'), ('D', 'D', 'D'),
                         ('D', 'D', 'D')),) * 2,
                cbcpre=(('P', 'N', 'N'), ('P', 'N', 'N')),
                cbcsgs=(('P', 'D', 'D'), ('P', 'D', 'D')))
    results = []
    # run 0: XLA path, generic full-pad wall-model update (the oracle);
    # run 1: XLA path, sliced-row fast wm update (must be bit-identical);
    # run 2: kernel path (fast wm + wm-plane ye bundles)
    for i, up_ in enumerate((False, False, True)):
        if i == 0:
            monkeypatch.setenv('CALES_NO_WM_FAST', '1')
        else:
            monkeypatch.delenv('CALES_NO_WM_FAST', raising=False)
        cfg = Config(**base, use_pallas=up_)
        grid = make_grid_from_config(cfg)
        sim = Simulation(cfg, grid)
        if up_:
            assert sim.use_pallas_mom, sim.exec_path()
            assert sim._ywalled and sim.has_wm and sim._wm_fast
            assert not sim.use_pallas_smag     # XLA smag fallback
        s = sim.initial_state(*initflow(cfg, grid))
        for _ in range(2):
            s, _ = sim.step(s, 1e-3)
        results.append(s)
    a, fast, b = results
    for f in ('u', 'v', 'w', 'p', 'visct'):
        np.testing.assert_array_equal(np.asarray(getattr(fast, f)),
                                      np.asarray(getattr(a, f)),
                                      err_msg=f'wm fast path: {f}')
    np.testing.assert_allclose(np.asarray(b.u), np.asarray(a.u), atol=1e-12)
    np.testing.assert_allclose(np.asarray(b.v), np.asarray(a.v), atol=1e-12)
    np.testing.assert_allclose(np.asarray(b.w), np.asarray(a.w), atol=1e-12)
    np.testing.assert_allclose(np.asarray(b.p), np.asarray(a.p), atol=1e-11)
    np.testing.assert_allclose(np.asarray(b.visct), np.asarray(a.visct),
                               atol=1e-13)


def test_pallas_step_integration_xwalled(monkeypatch):
    """Kernel path on non-periodic-x configs (inflow/outflow developing
    channel class, examples/developing_channel): the host-built x-ghost-
    column bundles (ops/boundary.xedge_*) ride the xe edge-lane roll-fix
    protocol and u's wall-face rewrite is patched into the kernel-input
    copy.  Parity vs the all-XLA path, incl. the retained u inflow-face
    plane (vlo[0])."""
    monkeypatch.setenv('CALES_PALLAS_INTERPRET', '1')
    from cales_tpu.initflow import initflow
    from cales_tpu.timeloop import Simulation

    base = dict(ng=(128, 16, 16), l=(2.0, 1.5, 1.0), gtype=1, gr=0.0,
                visci=5000.0, inivel='uni', is_wallturb=False,
                dtype='float64',
                cbcvel=((('D', 'N', 'N'), ('P', 'P', 'P'),
                         ('D', 'D', 'D')),
                        (('N', 'N', 'N'), ('P', 'P', 'P'),
                         ('D', 'D', 'D'))),
                bcvel=(((1.0, 0.0, 0.0), (0.0, 0.0, 0.0),
                        (0.0, 0.0, 0.0)),) * 2,
                cbcpre=(('N', 'P', 'N'), ('D', 'P', 'N')),
                cbcsgs=(('N', 'P', 'D'), ('N', 'P', 'D')))
    for sgstype, extra in (('none', {}), ('smag', {}),
                           ('none', dict(impdiff=True, impdiff_1d=True))):
        results = []
        for up_ in (False, True):
            cfg = Config(**base, sgstype=sgstype, use_pallas=up_, **extra)
            grid = make_grid_from_config(cfg)
            sim = Simulation(cfg, grid)
            if up_:
                assert sim.use_pallas_mom, sim.exec_path()
                assert sim._xwalled and not sim._ywalled
                assert not sim.use_pallas_smag   # XLA smag fallback
            s = sim.initial_state(*initflow(cfg, grid))
            for _ in range(3):
                s, _ = sim.step(s, 5e-4)
            results.append(s)
        a, b = results
        np.testing.assert_allclose(np.asarray(b.u), np.asarray(a.u),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(b.v), np.asarray(a.v),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(b.w), np.asarray(a.w),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(b.p), np.asarray(a.p),
                                   atol=1e-11)
        np.testing.assert_allclose(np.asarray(b.visct),
                                   np.asarray(a.visct), atol=1e-13)
        for m in range(3):
            np.testing.assert_allclose(np.asarray(b.vlo[m]),
                                       np.asarray(a.vlo[m]), atol=1e-12,
                                       err_msg=f'vlo[{m}] ({sgstype}, '
                                               f'{extra})')


def test_pallas_step_integration_xywalled(monkeypatch):
    """Kernel path on x+y-walled configs (closed-box topology): the
    in-kernel ye-bundle wall fixes compose with the host-built xe
    ghost-column bundles — the xe window's y-wall ghost rows come from the
    bundle's xe corner section (rows 3*nfields+0/1/2, _PlaneAccessor
    xe_ybase).  Cases: the TRUE lid-driven cavity (all-D walls, nonzero
    lid — inhomogeneous corner recipes) and a developing duct
    (inflow/outflow x + y/z walls)."""
    monkeypatch.setenv('CALES_PALLAS_INTERPRET', '1')
    from cales_tpu.initflow import initflow
    from cales_tpu.models.cases import lid_driven_cavity
    from cales_tpu.timeloop import Simulation

    dduct = dict(ng=(128, 16, 16), l=(2.0, 1.0, 1.0), gtype=1, gr=0.0,
                 visci=2000.0, inivel='uni', is_wallturb=False,
                 dtype='float64', sgstype='none',
                 cbcvel=((('D', 'N', 'N'), ('D', 'D', 'D'),
                          ('D', 'D', 'D')),
                         (('N', 'N', 'N'), ('D', 'D', 'D'),
                          ('D', 'D', 'D'))),
                 bcvel=(((1.0, 0.0, 0.0), (0.0, 0.0, 0.0),
                         (0.0, 0.0, 0.0)),) * 2,
                 cbcpre=(('N', 'N', 'N'), ('D', 'N', 'N')),
                 cbcsgs=(('N', 'D', 'D'), ('N', 'D', 'D')))

    def cav(up_):
        return lid_driven_cavity(ng=(128, 16, 16), visci=1000.0,
                                 dtype='float64', sgstype='none',
                                 use_pallas=up_)

    for mk in (cav, lambda up_: Config(**dduct, use_pallas=up_)):
        results = []
        for up_ in (False, True):
            cfg = mk(up_)
            grid = make_grid_from_config(cfg)
            sim = Simulation(cfg, grid)
            if up_:
                assert sim.use_pallas_mom, sim.exec_path()
                assert sim._xwalled and sim._ywalled
            s = sim.initial_state(*initflow(cfg, grid))
            for _ in range(3):
                s, _ = sim.step(s, 5e-4)
            results.append(s)
        a, b = results
        for f in ('u', 'v', 'w'):
            np.testing.assert_allclose(np.asarray(getattr(b, f)),
                                       np.asarray(getattr(a, f)),
                                       atol=1e-12, err_msg=f)
        # all-N pressure is defined up to a constant: the Pallas Thomas
        # solve PINS the singular mode while eig projects it — compare
        # gauge-free
        pa, pb = np.asarray(a.p), np.asarray(b.p)
        np.testing.assert_allclose(pb - pb.mean(), pa - pa.mean(),
                                   atol=1e-11)
        for m in range(3):
            np.testing.assert_allclose(np.asarray(b.vlo[m]),
                                       np.asarray(a.vlo[m]), atol=1e-12,
                                       err_msg=f'vlo[{m}]')


def test_pallas_step_integration_xwalled_scalar(monkeypatch):
    """Passive scalar on an x-walled (inflow/outflow) config: the scalar's
    x-ghost columns ride the host-built xe bundle after p (lane base 2m
    follows the kernel window order) with static D/N values
    (boundary.xedge_scalar), and its transport stays fused in the momentum
    kernel (scal.f90 under the developing-channel class)."""
    monkeypatch.setenv('CALES_PALLAS_INTERPRET', '1')
    from cales_tpu.initflow import initflow
    from cales_tpu.timeloop import Simulation

    base = dict(ng=(128, 16, 16), l=(2.0, 1.5, 1.0), gtype=1, gr=0.0,
                visci=5000.0, inivel='uni', is_wallturb=False,
                dtype='float64', sgstype='none',
                scalar=True, pr=0.71, iniscal='uni', ssource=0.02,
                cbcscal=(('D', 'P', 'N'), ('N', 'P', 'N')),
                bcscal=((1.0, 0.0, 0.0), (0.0, 0.0, 0.0)),
                cbcvel=((('D', 'N', 'N'), ('P', 'P', 'P'),
                         ('D', 'D', 'D')),
                        (('N', 'N', 'N'), ('P', 'P', 'P'),
                         ('D', 'D', 'D'))),
                bcvel=(((1.0, 0.0, 0.0), (0.0, 0.0, 0.0),
                        (0.0, 0.0, 0.0)),) * 2,
                cbcpre=(('N', 'P', 'N'), ('D', 'P', 'N')),
                cbcsgs=(('N', 'P', 'D'), ('N', 'P', 'D')))
    results = []
    for up_ in (False, True):
        cfg = Config(**base, use_pallas=up_)
        grid = make_grid_from_config(cfg)
        sim = Simulation(cfg, grid)
        if up_:
            assert sim.use_pallas_mom, sim.exec_path()
            assert sim._xwalled and sim._scal_kernel_ok, sim.exec_path()
        s = sim.initial_state(*initflow(cfg, grid))
        for _ in range(3):
            s, _ = sim.step(s, 5e-4)
        results.append(s)
    a, b = results
    for f in ('u', 'v', 'w', 's'):
        np.testing.assert_allclose(np.asarray(getattr(b, f)),
                                   np.asarray(getattr(a, f)),
                                   atol=1e-12, err_msg=f)
    np.testing.assert_allclose(np.asarray(b.p), np.asarray(a.p),
                               atol=1e-11)
    for m in range(3):
        np.testing.assert_allclose(np.asarray(b.vlo[m]),
                                   np.asarray(a.vlo[m]), atol=1e-12,
                                   err_msg=f'vlo[{m}]')


def test_pallas_xwalled_wm(monkeypatch):
    """x-walled (inflow/outflow) + z-wall-model config (developing WMLES
    class, round 5): the xe column bundles are built from the wm-updated
    Neumann planes each substep (boundary._corner_cols slices the planes'
    x-ghost columns for the z-corner stacks) exactly as the ye bundles
    are on duct WMLES; smag stays on the XLA fallback (use_pallas_smag
    excludes x-walled).  Parity vs the all-XLA path."""
    monkeypatch.setenv('CALES_PALLAS_INTERPRET', '1')
    from cales_tpu.initflow import initflow
    from cales_tpu.timeloop import Simulation

    base = dict(ng=(128, 16, 16), l=(6.4, 3.2, 2.0), gtype=6,
                visci=50000.0, inivel='uni', is_wallturb=False,
                dtype='float64', sgstype='smag',
                lwm=((0, 0, 1), (0, 0, 1)), hwm=0.1,
                cbcvel=((('D', 'N', 'N'), ('P', 'P', 'P'),
                         ('D', 'D', 'D')),
                        (('N', 'N', 'N'), ('P', 'P', 'P'),
                         ('D', 'D', 'D'))),
                bcvel=(((1.0, 0.0, 0.0), (0.0, 0.0, 0.0),
                        (0.0, 0.0, 0.0)),) * 2,
                cbcpre=(('N', 'P', 'N'), ('D', 'P', 'N')),
                cbcsgs=(('N', 'P', 'D'), ('N', 'P', 'D')))
    results = []
    for up_ in (False, True):
        cfg = Config(**base, use_pallas=up_)
        grid = make_grid_from_config(cfg)
        sim = Simulation(cfg, grid)
        if up_:
            assert sim.use_pallas_mom, sim.exec_path()
            assert sim._xwalled and sim.has_wm, sim.exec_path()
        s = sim.initial_state(*initflow(cfg, grid))
        for _ in range(2):
            s, _ = sim.step(s, 1e-3)
        results.append(s)
    a, b = results
    for f in ('u', 'v', 'w', 'p', 'visct'):
        np.testing.assert_allclose(np.asarray(getattr(b, f)),
                                   np.asarray(getattr(a, f)),
                                   atol=1e-11, err_msg=f)
    for m in range(3):
        np.testing.assert_allclose(np.asarray(b.vlo[m]),
                                   np.asarray(a.vlo[m]), atol=1e-12,
                                   err_msg=f'vlo[{m}]')


def test_pallas_plane_valued_bcs(monkeypatch):
    """USER-SUPPLIED plane-valued static BCs on the kernel path (round 5):
    a z-varying inflow profile on a developing channel (x-walled class —
    the xe column bundles crop the padded plane via _bc_row/_corner_cols)
    and an x-varying moving lid on a periodic channel (z-edge stacks carry
    the plane; the correc+smag fusion correctly downgrades to the separate
    plane-capable kernels).  Parity vs the all-XLA path."""
    monkeypatch.setenv('CALES_PALLAS_INTERPRET', '1')
    from cales_tpu.initflow import initflow
    from cales_tpu.timeloop import Simulation

    nx, ny, nz = 128, 16, 16
    # padded (nz+2, ny+2) x-face inflow profile: parabolic in z
    zc = (np.arange(nz + 2) - 0.5) / nz
    prof = (6.0 * zc * (1.0 - zc))[:, None] * np.ones((1, ny + 2))
    xwalled = dict(ng=(nx, ny, nz), l=(2.0, 1.5, 1.0), gtype=1, gr=0.0,
                   visci=5000.0, inivel='uni', is_wallturb=False,
                   dtype='float64', sgstype='none',
                   cbcvel=((('D', 'N', 'N'), ('P', 'P', 'P'),
                            ('D', 'D', 'D')),
                           (('N', 'N', 'N'), ('P', 'P', 'P'),
                            ('D', 'D', 'D'))),
                   bcvel=(((prof, 0.0, 0.0), (0.0, 0.0, 0.0),
                           (0.0, 0.0, 0.0)),) * 2,
                   cbcpre=(('N', 'P', 'N'), ('D', 'P', 'N')),
                   cbcsgs=(('N', 'P', 'D'), ('N', 'P', 'D')))
    # padded (ny+2, nx+2) moving-lid plane: sinusoidal in x
    lid = 1.0 + 0.3 * np.sin(
        2 * np.pi * np.arange(nx + 2) / nx)[None, :] * np.ones((ny + 2, 1))
    chan = dict(ng=(nx, ny, nz), l=(2 * np.pi, np.pi, 1.0), gtype=1, gr=0.0,
                visci=2000.0, inivel='uni', is_wallturb=False,
                dtype='float64', sgstype='smag',
                cbcvel=((('P', 'P', 'P'), ('P', 'P', 'P'),
                         ('D', 'D', 'D')),) * 2,
                bcvel=(((0.0,) * 3,) * 3,
                       ((0.0, 0.0, 0.0), (0.0, 0.0, 0.0),
                        (lid, 0.0, 0.0))),
                cbcpre=(('P', 'P', 'N'), ('P', 'P', 'N')),
                cbcsgs=(('P', 'P', 'D'), ('P', 'P', 'D')))
    for tag, base in (('xwalled-inflow', xwalled), ('lid-plane', chan)):
        results = []
        for up_ in (False, True):
            cfg = Config(**base, use_pallas=up_)
            grid = make_grid_from_config(cfg)
            sim = Simulation(cfg, grid)
            if up_:
                assert sim.use_pallas_mom, (tag, sim.exec_path())
                assert not sim._scalar_bcs
                assert not sim._fuse_correc_smag
            s = sim.initial_state(*initflow(cfg, grid))
            for _ in range(2):
                s, _ = sim.step(s, 5e-4)
            results.append(s)
        a, b = results
        names = ('u', 'v', 'w', 'p') + (('visct',)
                                        if base['sgstype'] != 'none' else ())
        for f in names:
            np.testing.assert_allclose(np.asarray(getattr(b, f)),
                                       np.asarray(getattr(a, f)),
                                       atol=1e-11, err_msg=f'{tag}:{f}')
        for m in range(3):
            # vlo planes are semantically live only along walled
            # directions (pad_velocity's 'P' branch never reads vlo, and
            # the kernel path then keeps the stale state plane by design)
            if base['cbcvel'][0][m][m] == 'P':
                continue
            np.testing.assert_allclose(np.asarray(b.vlo[m]),
                                       np.asarray(a.vlo[m]), atol=1e-12,
                                       err_msg=f'{tag}:vlo[{m}]')


def test_pallas_xywalled_scalar(monkeypatch):
    """Passive scalar on an x+y-walled config (developing duct class,
    round 5): the scalar's x-ghost columns ride the xe bundle after p AND
    its xye corner section rides the ye bundle (_xye_entries has_scal) —
    the last scalar kernel-path fallback closed."""
    monkeypatch.setenv('CALES_PALLAS_INTERPRET', '1')
    from cales_tpu.initflow import initflow
    from cales_tpu.timeloop import Simulation

    base = dict(ng=(128, 16, 16), l=(2.0, 1.0, 1.0), gtype=1, gr=0.0,
                visci=2000.0, inivel='uni', is_wallturb=False,
                dtype='float64', sgstype='none',
                scalar=True, pr=0.71, iniscal='uni', ssource=0.02,
                cbcscal=(('D', 'D', 'N'), ('N', 'N', 'N')),
                bcscal=((1.0, 0.5, 0.0), (0.0, 0.0, 0.0)),
                cbcvel=((('D', 'N', 'N'), ('D', 'D', 'D'),
                         ('D', 'D', 'D')),
                        (('N', 'N', 'N'), ('D', 'D', 'D'),
                         ('D', 'D', 'D'))),
                bcvel=(((1.0, 0.0, 0.0), (0.0, 0.0, 0.0),
                        (0.0, 0.0, 0.0)),) * 2,
                cbcpre=(('N', 'N', 'N'), ('D', 'N', 'N')),
                cbcsgs=(('N', 'D', 'D'), ('N', 'D', 'D')))
    results = []
    for up_ in (False, True):
        cfg = Config(**base, use_pallas=up_)
        grid = make_grid_from_config(cfg)
        sim = Simulation(cfg, grid)
        if up_:
            assert sim.use_pallas_mom, sim.exec_path()
            assert (sim._xwalled and sim._ywalled
                    and sim._scal_kernel_ok), sim.exec_path()
        s = sim.initial_state(*initflow(cfg, grid))
        for _ in range(3):
            s, _ = sim.step(s, 5e-4)
        results.append(s)
    a, b = results
    for f in ('u', 'v', 'w', 's', 'p'):
        np.testing.assert_allclose(np.asarray(getattr(b, f)),
                                   np.asarray(getattr(a, f)),
                                   atol=1e-11, err_msg=f)
    for m in range(3):
        np.testing.assert_allclose(np.asarray(b.vlo[m]),
                                   np.asarray(a.vlo[m]), atol=1e-12,
                                   err_msg=f'vlo[{m}]')


def test_pallas_step_integration_dsmag(monkeypatch):
    """Dynamic-Smagorinsky TWO-PASS kernel pipeline (DS1+DS2, interpret
    mode) vs the XLA dsmag path: channel, 2 steps, near-bitwise (averaging
    reassociates -> 1e-11 tolerance).  TWOPASS forced: the two-pass
    pipeline stays reachable (sharded shards too small for the one-pass
    rings) and must keep its own parity."""
    monkeypatch.setenv('CALES_PALLAS_INTERPRET', '1')
    monkeypatch.setenv('CALES_DSMAG_TWOPASS', '1')
    from cales_tpu.initflow import initflow
    from cales_tpu.timeloop import Simulation

    for avg in ('channel', 'duct', 'cavity'):
        base = dict(ng=(128, 16, 16), l=(2 * np.pi, np.pi, 2.0), gtype=1,
                    gr=0.9, visci=2000.0, inivel='log', is_wallturb=True,
                    dtype='float64', is_forced=(True, False, False),
                    velf=(1.0, 0.0, 0.0), sgstype='dsmag', dsmag_avg=avg)
        results = []
        for up_ in (False, True):
            cfg = Config(**base, use_pallas=up_)
            grid = make_grid_from_config(cfg)
            sim = Simulation(cfg, grid)
            if up_:
                assert sim.use_pallas_dsmag
            s = sim.initial_state(*initflow(cfg, grid))
            for _ in range(2):
                s, _ = sim.step(s, 1e-3)
            results.append(s)
        a, b = results
        for name in ('u', 'v', 'w', 'p', 'visct'):
            x, y = np.asarray(getattr(a, name)), np.asarray(getattr(b, name))
            np.testing.assert_allclose(y, x, atol=2e-11,
                                       err_msg=f'{name} ({avg})')


def test_pallas_dsmag_bf16_intermediates(monkeypatch):
    """The f32 production path stores the DS1->DS2 intermediates (fm, lij)
    in bf16 (pallas_dsmag.inter_dtype).  Pin the error budget: visct within
    ~0.5% rel of the f32-intermediate kernel run after 2 steps, velocity
    within 1e-5 rel (the f64 bitwise parity is test_pallas_step_integration_
    dsmag; CALES_DSMAG_F32=1 is the kill switch exercised here).  TWOPASS
    forced — the one-pass kernel keeps no HBM intermediates at all."""
    monkeypatch.setenv('CALES_PALLAS_INTERPRET', '1')
    monkeypatch.setenv('CALES_DSMAG_TWOPASS', '1')
    from cales_tpu.initflow import initflow
    from cales_tpu.timeloop import Simulation
    from cales_tpu.ops import pallas_dsmag as pds

    assert pds.inter_dtype(16, 16, np.float32, 128) == np.dtype(jnp.bfloat16)
    assert pds.inter_dtype(16, 16, np.float64, 128) == np.dtype(np.float64)
    monkeypatch.setenv('CALES_DSMAG_F32', '1')
    assert pds.inter_dtype(16, 16, np.float32, 128) == np.dtype(np.float32)
    monkeypatch.delenv('CALES_DSMAG_F32')

    base = dict(ng=(128, 16, 16), l=(2 * np.pi, np.pi, 2.0), gtype=1,
                gr=0.9, visci=2000.0, inivel='log', is_wallturb=True,
                dtype='float32', is_forced=(True, False, False),
                velf=(1.0, 0.0, 0.0), sgstype='dsmag', dsmag_avg='channel',
                use_pallas=True)
    results = []
    for kill in ('', '1'):
        monkeypatch.setenv('CALES_DSMAG_F32', kill)
        cfg = Config(**base)
        grid = make_grid_from_config(cfg)
        sim = Simulation(cfg, grid)
        assert sim.use_pallas_dsmag
        s = sim.initial_state(*initflow(cfg, grid))
        for _ in range(2):
            s, _ = sim.step(s, 1e-3)
        results.append(s)
    bf, f32 = results
    for name, rtol in (('u', 1e-5), ('v', 1e-5), ('w', 1e-5),
                       ('visct', 5e-3)):
        a = np.asarray(getattr(bf, name)).astype(np.float64)
        b = np.asarray(getattr(f32, name)).astype(np.float64)
        scale = max(float(np.abs(b).max()), 1e-30)
        assert float(np.abs(a - b).max()) / scale < rtol, name


def test_y_ext_mode_matches_wrap():
    """y_ext kernel inputs built from global periodic wraps must reproduce
    the wrap-mode outputs bitwise (the shard_map halo-strip path)."""
    ng = (128, 32, 16)
    cfg = Config(ng=ng, l=(2 * np.pi, np.pi, 2.0), gtype=1, gr=1.0,
                 dtype='float64')
    grid = make_grid_from_config(cfg)
    nx, ny, nz = ng
    rng = np.random.default_rng(9)
    fields = {}
    for name, rw in (('u', False), ('v', False), ('w', True), ('s', False),
                     ('p', False)):
        fields[name] = _rand_field_edges(rng, nz, ny, nx, rewrite_last=rw)
    ruo, rvo, rwo = (jnp.asarray(rng.standard_normal((nz, ny, nx)))
                     for _ in range(3))
    exty = lambda a: jnp.concatenate([a[:, -8:], a, a[:, :8]], axis=1)
    args_wrap, args_ext = [], []
    for name in ('u', 'v', 'w', 's', 'p'):
        args_wrap.append(fields[name][0])
        args_ext.append(exty(fields[name][0]))
    for name in ('u', 'v', 'w', 's', 'p'):
        args_wrap.append(fields[name][1])
        args_ext.append(exty(fields[name][1]))
    common = (ruo, rvo, rwo, grid.dzci, grid.dzfi, 0.5e-3, -0.2e-3, 0.01,
              float(nx / cfg.l[0]), float(ny / cfg.l[1]), (0.1, 0.0, 0.0))
    a = fused_mom_rk(*args_wrap, *common, interpret=True)
    b = fused_mom_rk(*args_ext, *common, interpret=True, y_ext=True)
    assert a is not None and b is not None
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # fillps + correc too
    fa = fused_fillps(*args_wrap[0:3], *args_wrap[5:8], grid.dzfi,
                      1.0 / 2e-3, common[8], common[9], interpret=True)
    fb = fused_fillps(*args_ext[0:3], *args_ext[5:8], grid.dzfi,
                      1.0 / 2e-3, common[8], common[9], interpret=True,
                      y_ext=True)
    np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))
    pp, ppe, _ = _rand_field_edges(rng, nz, ny, nx)
    pres = jnp.asarray(rng.standard_normal((nz, ny, nx)))
    ca = fused_correc_updatep(args_wrap[0], args_wrap[1], args_wrap[2],
                              pp, pres, args_wrap[7], ppe, 2e-3,
                              common[8], common[9], grid.dzci, interpret=True)
    cb = fused_correc_updatep(args_wrap[0], args_wrap[1], exty(args_wrap[2]),
                              exty(pp), pres, exty(args_wrap[7]), exty(ppe),
                              2e-3, common[8], common[9], grid.dzci,
                              interpret=True, y_ext=True)
    for x, y in zip(ca, cb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    sa = fused_smag(*args_wrap[0:3], *args_wrap[5:8], grid.dzci, grid.dzfi,
                    common[8], common[9], 0.01, np.full(nz, 0.1),
                    interpret=True)
    sb = fused_smag(*args_ext[0:3], *args_ext[5:8], grid.dzci, grid.dzfi,
                    common[8], common[9], 0.01, np.full(nz, 0.1),
                    interpret=True, y_ext=True)
    np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))


def test_pallas_step_integration_impdiff(monkeypatch):
    """Kernel path with implicit diffusion (BASELINE config #2 class): the
    mom kernel emits the explicit/implicit RHS split, the CN Helmholtz
    solves stay on the XLA/matmul path, and the correc kernel applies the
    alpha*L(pp) pressure correction (main.f90:423-491, updatep.f90:26-50)."""
    monkeypatch.setenv('CALES_PALLAS_INTERPRET', '1')
    from cales_tpu.initflow import initflow
    from cales_tpu.timeloop import Simulation

    for imp1d in (False, True):
        base = dict(ng=(128, 16, 16), l=(2 * np.pi, np.pi, 2.0), gtype=1,
                    gr=0.9, visci=2000.0, inivel='log', is_wallturb=True,
                    dtype='float64', is_forced=(True, False, False),
                    velf=(1.0, 0.0, 0.0), sgstype='none', impdiff=True,
                    impdiff_1d=imp1d)
        results = []
        for use_pallas in (False, True):
            cfg = Config(**base, use_pallas=use_pallas)
            grid = make_grid_from_config(cfg)
            sim = Simulation(cfg, grid)
            if use_pallas:
                assert sim.use_pallas_mom, sim.exec_path()
                assert sim._mom_split == ('1d' if imp1d else 'xy+z')
                # the CN fold (rd streams elided, forcing folded into the
                # solve RHS for impdiff_1d) must be what this test covers
                assert sim._cn_fold
                assert sim._cn_shift_forcing == imp1d
            else:
                assert not sim._cn_fold
            s = sim.initial_state(*initflow(cfg, grid))
            for _ in range(3):
                s, _ = sim.step(s, 1e-3)
            results.append(s)
        a, b = results
        np.testing.assert_allclose(np.asarray(b.u), np.asarray(a.u),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(b.v), np.asarray(a.v),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(b.w), np.asarray(a.w),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(b.p), np.asarray(a.p),
                                   atol=1e-11)
        np.testing.assert_allclose(np.asarray(b.rhs_old[0]),
                                   np.asarray(a.rhs_old[0]), atol=1e-12)


def _xe_pack(fields, lo_cols, hi_cols):
    """Packed x-ghost bundle: lane 2m = lo ghost col, 2m+1 = hi ghost col."""
    cols = []
    for m in range(len(fields)):
        cols.append(np.asarray(lo_cols[m])[..., None])
        cols.append(np.asarray(hi_cols[m])[..., None])
    z = np.zeros(cols[0].shape[:-1] + (128 - len(cols),), cols[0].dtype)
    return jnp.asarray(np.concatenate(cols + [z], axis=-1))


def test_mom_rk_x_split_with_xe_bundle():
    """x-sharded kernel protocol: run fused_mom_rk on each x half with the
    neighbor's ghost columns in the xe bundle; the concatenation must equal
    the full-array (periodic-roll) kernel bitwise."""
    ng = (256, 16, 16)
    cfg = Config(ng=ng, l=(2 * np.pi, np.pi, 2.0), gtype=1, gr=1.0,
                 dtype='float64')
    grid = make_grid_from_config(cfg)
    nx, ny, nz = ng
    rng = np.random.default_rng(3)
    fields = {}
    for name, rw in (('u', False), ('v', False), ('w', True), ('s', False),
                     ('p', False)):
        fields[name] = _rand_field_edges(rng, nz, ny, nx, rewrite_last=rw)
    ruo, rvo, rwo = (jnp.asarray(rng.standard_normal((nz, ny, nx)))
                     for _ in range(3))
    common = dict(f1=0.5e-3, f2=-0.2e-3, visc=0.01,
                  dxi=float(nx / cfg.l[0]), dyi=float(ny / cfg.l[1]),
                  bforce=(0.1, 0.0, 0.0))
    names = ('u', 'v', 'w', 's', 'p')
    full = fused_mom_rk(*[fields[n][0] for n in names],
                        *[fields[n][1] for n in names],
                        ruo, rvo, rwo, grid.dzci, grid.dzfi,
                        interpret=True, **common)
    assert full is not None

    h = nx // 2
    parts = []
    for sh in range(2):
        sl = slice(0, h) if sh == 0 else slice(h, nx)
        osl = slice(h, nx) if sh == 0 else slice(0, h)
        ints = [np.asarray(fields[n][0]) for n in names]
        edges = [np.asarray(fields[n][1]) for n in names]
        xe = _xe_pack(names, [i[:, :, osl][:, :, -1] for i in ints],
                      [i[:, :, osl][:, :, 0] for i in ints])
        xze = _xe_pack(names, [e[:, :, osl][:, :, -1] for e in edges],
                       [e[:, :, osl][:, :, 0] for e in edges])
        out = fused_mom_rk(*[jnp.asarray(i[:, :, sl]) for i in ints],
                           *[jnp.asarray(e[:, :, sl]) for e in edges],
                           ruo[:, :, sl], rvo[:, :, sl], rwo[:, :, sl],
                           grid.dzci, grid.dzfi, interpret=True,
                           xe=xe, xze=xze, **common)
        assert out is not None
        parts.append(out)
    for m in range(6):
        merged = np.concatenate([np.asarray(parts[0][m]),
                                 np.asarray(parts[1][m])], axis=2)
        np.testing.assert_array_equal(merged, np.asarray(full[m]))


def test_pallas_step_integration_ywalls_duct(monkeypatch):
    """Kernel path on a y-walled duct-class config (x periodic, y and z
    Dirichlet walls): the ye-bundle ghost-row fixes must reproduce the XLA
    expression path near-bitwise (sgs falls back to XLA; the mom/fillps/
    correc kernels carry the duct BCs in-window)."""
    monkeypatch.setenv('CALES_PALLAS_INTERPRET', '1')
    from cales_tpu.initflow import initflow
    from cales_tpu.timeloop import Simulation

    duct_bcs = dict(
        cbcvel=((('P', 'P', 'P'), ('D', 'D', 'D'), ('D', 'D', 'D')),) * 2,
        cbcpre=(('P', 'N', 'N'), ('P', 'N', 'N')),
        cbcsgs=(('P', 'N', 'N'), ('P', 'N', 'N')))
    for sgstype in ('none', 'smag'):
        base = dict(ng=(128, 16, 16), l=(2 * np.pi, 2.0, 2.0), gtype=1,
                    gr=0.5, visci=2000.0, inivel='duc', is_wallturb=False,
                    dtype='float64', is_forced=(True, False, False),
                    velf=(1.0, 0.0, 0.0), sgstype=sgstype, **duct_bcs)
        results = []
        for use_pallas in (False, True):
            cfg = Config(**base, use_pallas=use_pallas)
            grid = make_grid_from_config(cfg)
            sim = Simulation(cfg, grid)
            if use_pallas:
                assert sim.use_pallas_mom, sim.exec_path()
                assert sim._ywalled
            s = sim.initial_state(*initflow(cfg, grid))
            for _ in range(3):
                s, _ = sim.step(s, 1e-3)
            results.append(s)
        a, b = results
        for name in ('u', 'v', 'w', 'p', 'visct'):
            x = np.asarray(getattr(a, name))
            y = np.asarray(getattr(b, name))
            err = np.abs(x - y).max()
            assert err < 1e-11, f"{name} ({sgstype}) duct kernel mismatch: {err}"
        # the retained wall-face planes must match too (vlo is solver state)
        for m in (1, 2):
            err = np.abs(np.asarray(a.vlo[m]) - np.asarray(b.vlo[m])).max()
            assert err < 1e-11, f"vlo[{m}] ({sgstype}) mismatch: {err}"


def test_pallas_dsmag_ywalls_duct_cavity(monkeypatch):
    """Dynamic-Smagorinsky Pallas pipeline on y-walled configs (BASELINE
    config #4): square duct (dsmag_avg='duct') and x-periodic lid-driven
    cavity (dsmag_avg='cavity') must reproduce the XLA dsmag path
    (sgs.f90:153-380 _DUCT/_CAVITY classes)."""
    monkeypatch.setenv('CALES_PALLAS_INTERPRET', '1')
    from cales_tpu.initflow import initflow
    from cales_tpu.timeloop import Simulation

    duct_bcs = dict(
        cbcvel=((('P', 'P', 'P'), ('D', 'D', 'D'), ('D', 'D', 'D')),) * 2,
        cbcpre=(('P', 'N', 'N'), ('P', 'N', 'N')),
        cbcsgs=(('P', 'N', 'N'), ('P', 'N', 'N')))
    cases = [
        dict(ng=(128, 16, 16), l=(2 * np.pi, 2.0, 2.0), gtype=1, gr=0.5,
             visci=2000.0, inivel='duc', is_wallturb=False, dtype='float64',
             is_forced=(True, False, False), velf=(1.0, 0.0, 0.0),
             sgstype='dsmag', dsmag_avg='duct', **duct_bcs),
        dict(ng=(128, 16, 16), l=(1.0, 1.0, 1.0), gtype=1, gr=0.0,
             visci=1000.0, inivel='tgv', is_wallturb=False, dtype='float64',
             sgstype='dsmag', dsmag_avg='cavity',
             bcvel=(((0.0,) * 3,) * 3,
                    ((0.0, 0.0, 0.0), (0.0, 0.0, 0.0), (1.0, 0.0, 0.0))),
             **duct_bcs),
    ]
    for base in cases:
        results = []
        for use_pallas in (False, True):
            cfg = Config(**base, use_pallas=use_pallas)
            grid = make_grid_from_config(cfg)
            sim = Simulation(cfg, grid)
            if use_pallas:
                assert sim.use_pallas_dsmag, sim.exec_path()
                assert sim._dsmag_onepass, sim.exec_path()
            s = sim.initial_state(*initflow(cfg, grid))
            for _ in range(2):
                s, _ = sim.step(s, 5e-4)
            results.append(s)
        a, b = results
        for name in ('u', 'v', 'w', 'p', 'visct'):
            x = np.asarray(getattr(a, name))
            y = np.asarray(getattr(b, name))
            err = np.abs(x - y).max()
            assert err < 1e-11, \
                f"{name} ({base['dsmag_avg']}) dsmag mismatch: {err}"


def test_pallas_dsmag_onepass_channel(monkeypatch):
    """Single-pass Germano-Lilly kernel (pallas_dsmag.fused_dsmag_onepass:
    source planes, the 15 test-filtered quantities, and the Mij/Lij
    contraction in one z-march, no DS1->DS2 HBM intermediates) vs the
    two-pass pipeline: channel averaging, 2 steps.  (Periodic z — the
    'dit' class — is not kernel-eligible: the in-kernel ghost recipes
    need walls or homogeneous-N faces; duct/cavity onepass is covered by
    test_pallas_dsmag_ywalls_duct_cavity.)"""
    monkeypatch.setenv('CALES_PALLAS_INTERPRET', '1')
    from cales_tpu.initflow import initflow
    from cales_tpu.timeloop import Simulation

    cases = [
        dict(ng=(128, 16, 16), l=(2 * np.pi, np.pi, 2.0), gtype=1, gr=0.9,
             visci=2000.0, inivel='log', is_wallturb=True, dtype='float64',
             is_forced=(True, False, False), velf=(1.0, 0.0, 0.0),
             sgstype='dsmag', dsmag_avg='channel', use_pallas=True),
    ]
    for base in cases:
        results = []
        for two in ('1', ''):
            monkeypatch.setenv('CALES_DSMAG_TWOPASS', two)
            cfg = Config(**base)
            grid = make_grid_from_config(cfg)
            sim = Simulation(cfg, grid)
            assert sim._dsmag_onepass == (two == ''), sim.exec_path()
            s = sim.initial_state(*initflow(cfg, grid))
            for _ in range(2):
                s, _ = sim.step(s, 1e-3)
            results.append(s)
        a, b = results
        for name in ('u', 'v', 'w', 'p', 'visct'):
            x = np.asarray(getattr(a, name))
            y = np.asarray(getattr(b, name))
            if name == 'p' and base['dsmag_avg'] == 'dit':
                x, y = x - x.mean(), y - y.mean()
            err = np.abs(x - y).max()
            assert err < 1e-11, \
                f"{name} ({base['dsmag_avg']}) onepass mismatch: {err}"


def test_pallas_xop_plain_correc(monkeypatch):
    """x-transform fusion on the PLAIN fused_correc_updatep kernel (sgs
    none / impdiff / periodic z — the triperiodic and impdiff channel
    classes, round 4): full-step parity vs the XLA expression path with
    the fusion asserted ON."""
    monkeypatch.setenv('CALES_PALLAS_INTERPRET', '1')
    from cales_tpu.initflow import initflow
    from cales_tpu.timeloop import Simulation

    P3 = (('P', 'P', 'P'),) * 3
    chanv = ((('P', 'P', 'P'), ('P', 'P', 'P'), ('D', 'D', 'D')),) * 2
    chanp = (('P', 'P', 'N'),) * 2
    cases = [
        dict(ng=(128, 16, 16), l=(2 * np.pi,) * 3, gtype=0, gr=0.0,
             visci=1600.0, inivel='tgv', dtype='float64', sgstype='none',
             ptransform='mat',
             cbcvel=(P3, P3), cbcpre=(P3[0],) * 2, cbcsgs=(P3[0],) * 2),
        dict(ng=(128, 16, 16), l=(2 * np.pi, np.pi, 2.0), gtype=1, gr=0.9,
             visci=5640.0, inivel='poi', dtype='float64', sgstype='none',
             impdiff=True, impdiff_1d=True, ptransform='mat',
             is_forced=(True, False, False), velf=(1.0, 0.0, 0.0),
             cbcvel=chanv, cbcpre=chanp, cbcsgs=chanp),
    ]
    for base in cases:
        results = []
        for use_pallas in (False, True):
            cfg = Config(**base, use_pallas=use_pallas)
            grid = make_grid_from_config(cfg)
            sim = Simulation(cfg, grid)
            if use_pallas:
                assert sim._fuse_xop, sim.exec_path()
                assert not sim._fuse_correc_smag
            s = sim.initial_state(*initflow(cfg, grid))
            for _ in range(2):
                s, _ = sim.step(s, 1e-3)
            results.append(s)
        a, b = results
        periodic_z = base['gtype'] == 0
        for name in ('u', 'v', 'w', 'p'):
            x = np.asarray(getattr(a, name))
            y = np.asarray(getattr(b, name))
            if name == 'p' and periodic_z:
                x, y = x - x.mean(), y - y.mean()
            err = np.abs(x - y).max()
            assert err < 1e-11, f"{name} plain-xop mismatch: {err}"


def test_pallas_xop_ywalled_correc(monkeypatch):
    """x-transform fusion on the Y-WALLED plain correc path (duct/cavity
    classes, round 5): the pp y-bundle rows are built from spectral pp via
    the x-pointwise linear-homogeneous recipes and inverted host-side;
    the kernel window transform composes with the ye ghost substitution.
    Full-step parity vs the XLA expression path with the fusion asserted
    ON.  ICs carry a seeded x-asymmetric perturbation — an x-uniform
    cavity startup has only the DC x mode and would mask transform bugs."""
    monkeypatch.setenv('CALES_PALLAS_INTERPRET', '1')
    from cales_tpu import models
    from cales_tpu.initflow import initflow
    from cales_tpu.timeloop import Simulation

    rng_seed = 20260821
    cases = [
        ('duct-dsmag', lambda up: models.square_duct_les(
            ng=(128, 16, 16), dtype='float64', ptransform='mat',
            use_pallas=up)),
        ('cavity-dsmag', lambda up: models.spanwise_cavity(
            ng=(128, 16, 16), sgstype='dsmag', dtype='float64',
            ptransform='mat', use_pallas=up)),
        ('duct-impdiff1d', lambda up: models.square_duct_les(
            ng=(128, 16, 16), sgstype='none', impdiff=True, impdiff_1d=True,
            dtype='float64', ptransform='mat', use_pallas=up)),
    ]
    for tag, build in cases:
        results = []
        for use_pallas in (False, True):
            cfg = build(use_pallas)
            grid = make_grid_from_config(cfg)
            sim = Simulation(cfg, grid)
            if use_pallas:
                assert sim._ywalled and sim._fuse_xop, \
                    (tag, sim.exec_path())
                assert not sim._fuse_correc_smag
            rng = np.random.default_rng(rng_seed)
            fields = [np.asarray(f) for f in initflow(cfg, grid)]
            fields = [jnp.asarray(
                f + 1e-2 * rng.standard_normal(f.shape).astype(f.dtype))
                for f in fields]
            s = sim.initial_state(*fields)
            for _ in range(2):
                s, _ = sim.step(s, 1e-3)
            results.append(s)
        a, b = results
        names = ('u', 'v', 'w', 'p') + (
            ('visct',) if 'dsmag' in tag else ())
        for name in names:
            x = np.asarray(getattr(a, name))
            y = np.asarray(getattr(b, name))
            if name == 'p':
                # duct/cavity pressure BCs (P, N, N) are singular: the
                # Thomas solve PINS the constant mode, the XLA eig path
                # PROJECTS it — compare gauge-free
                x, y = x - x.mean(), y - y.mean()
            err = np.abs(x - y).max()
            assert err < 1e-11, f"{name} ({tag}) ywalled-xop mismatch: {err}"
        # the retained wall-face planes evolve through _advance_wall_planes
        # (the xf row inversions live there) — compare them too
        for i in (1, 2):
            x = np.asarray(a.vlo[i])
            y = np.asarray(b.vlo[i])
            err = np.abs(x - y).max()
            assert err < 1e-11, f"vlo[{i}] ({tag}) ywalled-xop mismatch: {err}"


def test_pallas_xop_fusion_matches_xla(monkeypatch):
    """x-transform fusion: the momentum kernel emits the projection RHS
    x-spectral and the corrector kernel consumes the solution x-spectral
    (the solve's first/last operator matmuls move onto the kernels' MXU);
    full-step parity vs the XLA path."""
    monkeypatch.setenv('CALES_PALLAS_INTERPRET', '1')
    from cales_tpu.initflow import initflow
    from cales_tpu.timeloop import Simulation

    base = dict(ng=(128, 16, 16), l=(2 * np.pi, np.pi, 2.0), gtype=1, gr=0.9,
                visci=2000.0, inivel='log', is_wallturb=True, dtype='float64',
                is_forced=(True, False, False), velf=(1.0, 0.0, 0.0),
                sgstype='smag', ptransform='mat')
    results = []
    for variant in ('xla', 'xop', 'yop', 'fillps+xop'):
        if variant == 'yop':
            monkeypatch.setenv('CALES_FUSE_YOP', '1')
        if variant == 'fillps+xop':
            monkeypatch.delenv('CALES_FUSE_YOP', raising=False)
            monkeypatch.setenv('CALES_FUSE_FILLPS', '1')
        cfg = Config(**base, use_pallas=variant != 'xla')
        grid = make_grid_from_config(cfg)
        sim = Simulation(cfg, grid)
        if variant == 'xop':
            assert sim._fuse_correc_smag and sim._fuse_xop, sim.exec_path()
            assert not sim._fuse_mom_fillps
        elif variant == 'yop':
            assert sim._fuse_yop, sim.exec_path()
        elif variant == 'fillps+xop':
            assert sim._fuse_mom_fillps and sim._fuse_xop, sim.exec_path()
        s = sim.initial_state(*initflow(cfg, grid))
        for _ in range(3):
            s, _ = sim.step(s, 1e-3)
        results.append(s)
    a = results[0]
    for b, tag in zip(results[1:], ('xop', 'yop', 'fillps+xop')):
        for name in ('u', 'v', 'w', 'p', 'visct'):
            x = np.asarray(getattr(a, name))
            y = np.asarray(getattr(b, name))
            if name == 'p':
                x, y = x - x.mean(), y - y.mean()
            err = np.abs(x - y).max()
            assert err < 1e-11, f"{name} {tag}-fusion mismatch: {err}"


def test_pallas_step_integration_dns_no_sgs(monkeypatch):
    """sgstype 'none' channel (the DNS perf class): the has_sgs=False
    momentum kernel (no visct stream/window, eddy terms elided) must
    reproduce the XLA expression path near-bitwise — the elided terms are
    exact zeros, so this is an equality-strength check."""
    monkeypatch.setenv('CALES_PALLAS_INTERPRET', '1')
    from cales_tpu.initflow import initflow
    from cales_tpu.timeloop import Simulation

    base = dict(ng=(128, 16, 16), l=(2 * np.pi, np.pi, 2.0), gtype=1, gr=0.9,
                visci=2000.0, inivel='log', is_wallturb=True, dtype='float64',
                is_forced=(True, False, False), velf=(1.0, 0.0, 0.0),
                sgstype='none')
    results = []
    for up_ in (False, True):
        cfg = Config(**base, use_pallas=up_)
        grid = make_grid_from_config(cfg)
        sim = Simulation(cfg, grid)
        if up_:
            assert sim.use_pallas_mom, sim.exec_path()
        s = sim.initial_state(*initflow(cfg, grid))
        for _ in range(3):
            s, _ = sim.step(s, 1e-3)
        results.append(s)
    a, b = results
    for name in ('u', 'v', 'w', 'p'):
        x, y = np.asarray(getattr(a, name)), np.asarray(getattr(b, name))
        err = np.abs(x - y).max()
        assert err < 1e-12, f"{name} DNS kernel mismatch: {err}"


def test_wmles_fused_correc_smag_matches_unfused(monkeypatch):
    """Round-3 WMLES fusion: the projection + pressure update + van-Driest
    smag pass with 'E' (lwm extrapolation) in-kernel strain ghosts and the
    wall-model Neumann planes recomputed from host-side-CORRECTED hwm rows
    must reproduce the unfused kernel path (separate correc + smag kernels
    + full post-correction wall-model update)."""
    monkeypatch.setenv('CALES_PALLAS_INTERPRET', '1')
    from cales_tpu import models
    from cales_tpu.initflow import initflow
    from cales_tpu.timeloop import Simulation

    cfg = models.channel_wmles(ng=(128, 16, 16), visci=50000.0,
                               dtype='float64', ptransform='mat')
    grid = make_grid_from_config(cfg)
    results = {}
    for fused in (True, False):
        if fused:
            monkeypatch.delenv('CALES_NO_FUSE_SMAG', raising=False)
        else:
            monkeypatch.setenv('CALES_NO_FUSE_SMAG', '1')
        sim = Simulation(cfg, grid)
        assert sim._fuse_correc_smag == fused, sim.exec_path()
        s = sim.initial_state(*initflow(cfg, grid))
        for _ in range(3):
            s, _ = sim.step(s, 2e-4)
        results[fused] = s
    a, b = results[False], results[True]
    for name in ('u', 'v', 'w', 'p', 'visct'):
        x = np.asarray(getattr(a, name))
        y = np.asarray(getattr(b, name))
        if name == 'p':
            x, y = x - x.mean(), y - y.mean()
        err = np.abs(x - y).max()
        assert err < 1e-11, f"{name} wmles-fusion mismatch: {err}"


def test_scalar_fused_in_mom_kernel_matches_xla(monkeypatch):
    """Passive scalar fused into the momentum mega-kernel (its own window
    + dsdt carry, scal.f90 + rk.f90:123-195) must reproduce the XLA
    expression path — velocity AND scalar — on a turbulent channel with
    walls in z and a forced scalar."""
    monkeypatch.setenv('CALES_PALLAS_INTERPRET', '1')
    from cales_tpu.initflow import initflow
    from cales_tpu.timeloop import Simulation

    base = dict(ng=(128, 16, 16), l=(2 * np.pi, np.pi, 2.0), gtype=1, gr=0.9,
                visci=2000.0, inivel='log', is_wallturb=True, dtype='float64',
                is_forced=(True, False, False), velf=(1.0, 0.0, 0.0),
                sgstype='smag', ptransform='mat',
                scalar=True, pr=0.71, iniscal='zer', ssource=0.05,
                cbcscal=(('P', 'P', 'N'), ('P', 'P', 'N')),
                cbcvel=((('P', 'P', 'P'), ('P', 'P', 'P'),
                         ('D', 'D', 'D')),) * 2,
                cbcpre=(('P', 'P', 'N'), ('P', 'P', 'N')),
                cbcsgs=(('P', 'P', 'N'), ('P', 'P', 'N')))
    results = []
    for use_pallas in (False, True):
        cfg = Config(**base, use_pallas=use_pallas)
        grid = make_grid_from_config(cfg)
        sim = Simulation(cfg, grid)
        assert sim.use_pallas_mom == use_pallas, sim.exec_path()
        s = sim.initial_state(*initflow(cfg, grid))
        for _ in range(3):
            s, _ = sim.step(s, 1e-3)
        results.append(s)
    a, b = results
    for name in ('u', 'v', 'w', 'p', 's'):
        x = np.asarray(getattr(a, name))
        y = np.asarray(getattr(b, name))
        if name == 'p':
            x, y = x - x.mean(), y - y.mean()
        err = np.abs(x - y).max()
        assert err < 1e-11, f"{name} fused-scalar mismatch: {err}"

def test_scalar_ywalled_duct_kernel_matches_xla(monkeypatch):
    """Passive scalar on a y-walled duct-class config (x periodic, y/z
    Dirichlet walls): the scalar's wall ghost rows ride the momentum
    kernel's ye bundle (rows after p, its own cbcscal/bcscal recipes) and
    must reproduce the XLA pad path — velocity AND scalar (scal.f90 with
    the _DUCT BC class)."""
    monkeypatch.setenv('CALES_PALLAS_INTERPRET', '1')
    from cales_tpu.initflow import initflow
    from cales_tpu.timeloop import Simulation

    base = dict(ng=(128, 16, 16), l=(2 * np.pi, 2.0, 2.0), gtype=1, gr=0.5,
                visci=2000.0, inivel='duc', is_wallturb=False,
                dtype='float64', is_forced=(True, False, False),
                velf=(1.0, 0.0, 0.0), sgstype='smag', ptransform='mat',
                scalar=True, pr=0.71, iniscal='uni', ssource=0.02,
                cbcscal=(('P', 'D', 'N'), ('P', 'D', 'N')),
                bcscal=((0.0, 1.0, 0.0), (0.0, 0.5, 0.0)),
                cbcvel=((('P', 'P', 'P'), ('D', 'D', 'D'),
                         ('D', 'D', 'D')),) * 2,
                cbcpre=(('P', 'N', 'N'), ('P', 'N', 'N')),
                cbcsgs=(('P', 'D', 'D'), ('P', 'D', 'D')))
    results = []
    for use_pallas in (False, True):
        cfg = Config(**base, use_pallas=use_pallas)
        grid = make_grid_from_config(cfg)
        sim = Simulation(cfg, grid)
        assert sim.use_pallas_mom == use_pallas, sim.exec_path()
        if use_pallas:
            assert sim._ywalled and sim._scal_kernel_ok
        s = sim.initial_state(*initflow(cfg, grid))
        for _ in range(3):
            s, _ = sim.step(s, 1e-3)
        results.append(s)
    a, b = results
    for name in ('u', 'v', 'w', 'p', 's', 'visct'):
        x = np.asarray(getattr(a, name))
        y = np.asarray(getattr(b, name))
        err = np.abs(x - y).max()
        assert err < 1e-11, f"{name} y-walled fused-scalar mismatch: {err}"


def test_scalar_wmles_kernel_matches_xla(monkeypatch):
    """Passive scalar + wall-modeled channel (log-law z walls): the wm
    only rewrites the VELOCITY ghost planes — the scalar's ghosts stay
    its static cbcscal recipes — so the fused scalar window composes
    with the wm kernel path unchanged.  The reference ships scal.f90
    unwired (SURVEY §2.1), so the XLA expression path is the oracle."""
    monkeypatch.setenv('CALES_PALLAS_INTERPRET', '1')
    from cales_tpu.initflow import initflow
    from cales_tpu.timeloop import Simulation

    base = dict(ng=(128, 16, 16), l=(12.8, 4.8, 2.0), gtype=6,
                visci=125000.0, inivel='poi', is_wallturb=True,
                dtype='float64', is_forced=(True, False, False),
                velf=(1.0, 0.0, 0.0), sgstype='smag',
                lwm=((0, 0, 1), (0, 0, 1)), hwm=0.1,
                scalar=True, pr=0.71, iniscal='zer', ssource=0.05,
                cbcscal=(('P', 'P', 'N'), ('P', 'P', 'N')),
                cbcvel=((('P', 'P', 'P'), ('P', 'P', 'P'),
                         ('D', 'D', 'D')),) * 2,
                cbcpre=(('P', 'P', 'N'), ('P', 'P', 'N')),
                cbcsgs=(('P', 'P', 'D'), ('P', 'P', 'D')))
    results = []
    for use_pallas in (False, True):
        cfg = Config(**base, use_pallas=use_pallas)
        grid = make_grid_from_config(cfg)
        sim = Simulation(cfg, grid)
        assert sim.use_pallas_mom == use_pallas, sim.exec_path()
        if use_pallas:
            assert sim.has_wm and sim._scal_kernel_ok, sim.exec_path()
        s = sim.initial_state(*initflow(cfg, grid))
        for _ in range(3):
            s, _ = sim.step(s, 1e-3)
        results.append(s)
    a, b = results
    for name in ('u', 'v', 'w', 'p', 's', 'visct'):
        x = np.asarray(getattr(a, name))
        y = np.asarray(getattr(b, name))
        if name == 'p':
            x, y = x - x.mean(), y - y.mean()
        err = np.abs(x - y).max()
        assert err < 1e-11, f"{name} wm+scalar kernel mismatch: {err}"


def test_scalar_duct_wmles_kernel_matches_xla(monkeypatch):
    """Passive scalar on the wall-modeled square duct (y/z log-law walls):
    the wm-updated Neumann planes ride the ye bundles while the scalar's
    wall ghost rows ride the same bundle with its own static recipes."""
    monkeypatch.setenv('CALES_PALLAS_INTERPRET', '1')
    from cales_tpu.initflow import initflow
    from cales_tpu.timeloop import Simulation

    base = dict(ng=(128, 16, 16), l=(12.8, 2.0, 2.0), gtype=1, gr=0.0,
                visci=20000.0, inivel='duc', is_wallturb=True,
                dtype='float64', is_forced=(True, False, False),
                velf=(1.0, 0.0, 0.0), sgstype='smag', hwm=0.2,
                lwm=((0, 1, 1), (0, 1, 1)),
                scalar=True, pr=0.71, iniscal='uni', ssource=0.02,
                cbcscal=(('P', 'N', 'N'), ('P', 'N', 'N')),
                cbcvel=((('P', 'P', 'P'), ('D', 'D', 'D'),
                         ('D', 'D', 'D')),) * 2,
                cbcpre=(('P', 'N', 'N'), ('P', 'N', 'N')),
                cbcsgs=(('P', 'D', 'D'), ('P', 'D', 'D')))
    results = []
    for use_pallas in (False, True):
        cfg = Config(**base, use_pallas=use_pallas)
        grid = make_grid_from_config(cfg)
        sim = Simulation(cfg, grid)
        assert sim.use_pallas_mom == use_pallas, sim.exec_path()
        if use_pallas:
            assert (sim._ywalled and sim.has_wm and sim._wm_fast
                    and sim._scal_kernel_ok), sim.exec_path()
        s = sim.initial_state(*initflow(cfg, grid))
        for _ in range(2):
            s, _ = sim.step(s, 1e-3)
        results.append(s)
    a, b = results
    for name in ('u', 'v', 'w', 'p', 's', 'visct'):
        x = np.asarray(getattr(a, name))
        y = np.asarray(getattr(b, name))
        if name == 'p':
            x, y = x - x.mean(), y - y.mean()
        err = np.abs(x - y).max()
        assert err < 1e-11, f"{name} duct-wm+scalar kernel mismatch: {err}"
