"""SGS model unit tests: strain rate (manufactured field), filters, static
Smagorinsky scaling, wall model log-law (analytic fixed point)."""
import numpy as np
import jax.numpy as jnp

from cales_tpu.config import Config, C_SMAG, KAP_LOG, B_LOG, effective_cbcvel
from cales_tpu.grid import make_grid_from_config
from cales_tpu.ops import stencil as st
from cales_tpu.sgs import SGSSetup, smag_visct
from cales_tpu.wallmodel import wallmodel_tauw


def test_strain_rate_linear_field():
    """For u = a*y (pure shear), S12 = a/2 and |S| = a; all other Sij = 0.
    (The reference validates its eddy-viscosity interpolation with linear
    manufactured fields, mom.f90:20-22.)"""
    n = 16
    cfg = Config(ng=(n, n, n), l=(1., 1., 1.), dtype='float64')
    grid = make_grid_from_config(cfg)
    a = 0.7
    y = (np.arange(-1, n + 1) + 0.5) / n  # padded y coordinates
    u = np.broadcast_to(a * y[None, :, None], (n + 2, n + 2, n + 2)).copy()
    zer = np.zeros_like(u)
    s0, sij = st.strain_rate(jnp.asarray(u), jnp.asarray(zer), jnp.asarray(zer),
                             grid.dzci, grid.dzfi, float(n), float(n),
                             with_sij=True)
    np.testing.assert_allclose(np.asarray(sij[3]), a / 2, rtol=1e-12)  # S12
    np.testing.assert_allclose(np.asarray(sij[0]), 0.0, atol=1e-12)    # S11
    np.testing.assert_allclose(np.asarray(s0), a, rtol=1e-12)          # |S|


def test_filter3d_separable_weights():
    """filter3d must reproduce the 27-point (8,4,2,1)/64 trapezoidal weights
    (sgs.f90:667-676)."""
    rng = np.random.default_rng(0)
    f = rng.standard_normal((6, 5, 7))
    out = np.asarray(st.filter3d(jnp.asarray(f)))
    # direct 27-point sum at one interior point
    k, j, i = 3, 2, 4
    w = {0: 8.0, 1: 4.0, 2: 2.0, 3: 1.0}
    acc = 0.0
    for dk in (-1, 0, 1):
        for dj in (-1, 0, 1):
            for di in (-1, 0, 1):
                acc += w[abs(dk) + abs(dj) + abs(di)] * f[k + dk, j + dj, i + di]
    np.testing.assert_allclose(out[k - 1, j - 1, i - 1], acc / 64.0, rtol=1e-12)


def test_smag_triperiodic_matches_formula():
    """No walls: visct = (Cs*Delta)^2 |S| exactly (sgs.f90:148-149, fd=1)."""
    n = 12
    cfg = Config(ng=(n, n, n), l=(1., 1., 1.), dtype='float64', sgstype='smag',
                 cbcvel=((('P',) * 3,) * 3, (('P',) * 3,) * 3),
                 cbcpre=(('P',) * 3, ('P',) * 3))
    grid = make_grid_from_config(cfg)
    setup = SGSSetup(cfg, grid, effective_cbcvel(cfg))
    rng = np.random.default_rng(1)
    f = rng.standard_normal((n, n, n))
    fp = jnp.asarray(np.pad(f, 1, mode='wrap'))
    visct = np.asarray(smag_visct(setup, cfg, grid, fp, fp * 0.3, fp * 0.1))
    s0 = np.asarray(st.strain_rate(fp, fp * 0.3, fp * 0.1, grid.dzci,
                                   grid.dzfi, float(n), float(n)))
    delta = (cfg.dl[0] * cfg.dl[1] * grid.dzf[1]) ** (1 / 3)
    np.testing.assert_allclose(visct, (C_SMAG * delta) ** 2 * s0, rtol=1e-12)


def test_wallmodel_loglaw_fixed_point():
    """Newton solve must satisfy u_par/u_tau = log(h u_tau / nu)/kappa + B to
    high precision, and tau components align with (uh, vh)
    (wmodel.f90:313-326)."""
    visc = 1.0 / 20000.0
    h = 0.1
    uh = jnp.asarray(np.full((4, 4), 0.9))
    vh = jnp.asarray(np.full((4, 4), 0.3))
    t1, t2 = wallmodel_tauw(1, uh, vh, h, 2.0, visc)
    upar = float(np.sqrt(0.9 ** 2 + 0.3 ** 2))
    utau = float(np.sqrt(np.asarray(t1)[0, 0] ** 2 + np.asarray(t2)[0, 0] ** 2)
                 ** 0.5)
    resid = upar / utau - np.log(h * utau / visc) / KAP_LOG - B_LOG
    assert abs(resid) < 1e-5
    np.testing.assert_allclose(np.asarray(t2)[0, 0] / np.asarray(t1)[0, 0],
                               0.3 / 0.9, rtol=1e-10)


def test_wallmodel_laminar():
    """Laminar wall model: tau_w = 2 u_max nu / delta with u_max from the
    parabolic profile at the matching height (wmodel.f90:327-333)."""
    visc = 0.01
    h, l1d = 0.1, 2.0
    uh = jnp.asarray(np.full((2, 2), 0.5))
    vh = jnp.zeros((2, 2))
    t1, t2 = wallmodel_tauw(-1, uh, vh, h, l1d, visc)
    dl = 0.5 * l1d
    umax = 0.5 / (h / dl * (2.0 - h / dl))
    np.testing.assert_allclose(np.asarray(t1), 2.0 / dl * umax * visc, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(t2), 0.0, atol=1e-12)


def test_smag_van_driest_channel_oracle():
    """Channel smag with van Driest damping vs an independent per-point loop
    implementation of sgs.f90:98-151 (nearest wall, one-sided tau_w, damping)."""
    n = (10, 8, 12)  # nx, ny, nz
    cfg = Config(ng=n, l=(1., 1., 2.), visci=200., gtype=1, gr=0.7,
                 dtype='float64', sgstype='smag')
    grid = make_grid_from_config(cfg)
    setup = SGSSetup(cfg, grid, effective_cbcvel(cfg))
    rng = np.random.default_rng(2)
    nz, ny, nx = n[2], n[1], n[0]
    up = rng.standard_normal((nz + 2, ny + 2, nx + 2))
    vp = rng.standard_normal((nz + 2, ny + 2, nx + 2))
    wp = rng.standard_normal((nz + 2, ny + 2, nx + 2))
    visct = np.asarray(smag_visct(setup, cfg, grid, jnp.asarray(up),
                                  jnp.asarray(vp), jnp.asarray(wp)))

    # independent oracle (channel: only z walls active)
    visc = cfg.visc
    s0 = np.asarray(st.strain_rate(jnp.asarray(up), jnp.asarray(vp),
                                   jnp.asarray(wp), grid.dzci, grid.dzfi,
                                   cfg.dli[0], cfg.dli[1]))
    zc = grid.zc[1:nz + 1]
    for (k, j, i) in [(0, 3, 4), (5, 2, 1), (nz - 1, 7, 9)]:
        dw_b, dw_t = zc[k], cfg.l[2] - zc[k]
        if dw_b <= dw_t:
            t1 = up[1, j + 1, i + 1] - up[0, j + 1, i + 1] \
                + up[1, j + 1, i] - up[0, j + 1, i]
            t2 = vp[1, j + 1, i + 1] - vp[0, j + 1, i + 1] \
                + vp[1, j, i + 1] - vp[0, j, i + 1]
            tw = 0.5 * visc * np.sqrt(t1 ** 2 + t2 ** 2) * grid.dzci[0]
            dw = dw_b
        else:
            t1 = up[nz, j + 1, i + 1] - up[nz + 1, j + 1, i + 1] \
                + up[nz, j + 1, i] - up[nz + 1, j + 1, i]
            t2 = vp[nz, j + 1, i + 1] - vp[nz + 1, j + 1, i + 1] \
                + vp[nz, j, i + 1] - vp[nz + 1, j, i + 1]
            tw = 0.5 * visc * np.sqrt(t1 ** 2 + t2 ** 2) * grid.dzci[nz]
            dw = dw_t
        fd = 1.0 - np.exp(-dw * np.sqrt(tw) / visc / 25.0)
        delta = (cfg.dl[0] * cfg.dl[1] * grid.dzf[k + 1]) ** (1 / 3)
        expect = (C_SMAG * delta * fd) ** 2 * s0[k, j, i]
        np.testing.assert_allclose(visct[k, j, i], expect, rtol=1e-12)


def test_dsmag_triperiodic_oracle():
    """Dynamic Smagorinsky vs an independent numpy transcription of the
    Germano-Lilly procedure (tri-periodic, 'dit' averaging; sgs.f90:153-380)."""
    from cales_tpu.sgs import dsmag_visct
    from cales_tpu.grid import make_grid_from_config

    n = 12
    cfg = Config(ng=(n, n, n), l=(1., 1., 1.), dtype='float64',
                 sgstype='dsmag', dsmag_avg='dit',
                 cbcvel=((('P',) * 3,) * 3, (('P',) * 3,) * 3),
                 cbcpre=(('P',) * 3, ('P',) * 3),
                 cbcsgs=(('P',) * 3, ('P',) * 3))
    grid = make_grid_from_config(cfg)
    setup = SGSSetup(cfg, grid, effective_cbcvel(cfg))
    rng = np.random.default_rng(4)
    u, v, w = (rng.standard_normal((n, n, n)) for _ in range(3))
    pw = lambda f: np.pad(f, 1, mode='wrap')
    up, vp, wp = map(jnp.asarray, (pw(u), pw(v), pw(w)))

    def pad_filtered(uf, vf, wf):
        return (jnp.asarray(pw(np.asarray(uf))), jnp.asarray(pw(np.asarray(vf))),
                jnp.asarray(pw(np.asarray(wf))))

    bcs_vals = tuple((0.0, 0.0) for _ in range(3))
    visct = np.asarray(dsmag_visct(setup, cfg, grid, up, vp, wp,
                                   bcs_vals, None, pad_filtered))

    # ---------------- independent numpy oracle ----------------
    dxi = dyi = dzi = float(n)

    def filt(f):   # 27-point trapezoidal top-hat on a wrapped field
        q = pw(f)
        out = np.zeros_like(f)
        wgt = {0: 8.0, 1: 4.0, 2: 2.0, 3: 1.0}
        for dk in (-1, 0, 1):
            for dj in (-1, 0, 1):
                for di in (-1, 0, 1):
                    out += wgt[abs(dk) + abs(dj) + abs(di)] * \
                        q[1 + dk:1 + dk + n, 1 + dj:1 + dj + n, 1 + di:1 + di + n]
        return out / 64.0

    def strain(u_, v_, w_):
        qu, qv, qw = pw(u_), pw(v_), pw(w_)
        C = lambda f, k=0, j=0, i=0: f[1 + k:1 + k + n, 1 + j:1 + j + n,
                                       1 + i:1 + i + n]
        s11 = (C(qu) - C(qu, i=-1)) * dxi
        s22 = (C(qv) - C(qv, j=-1)) * dyi
        s33 = (C(qw) - C(qw, k=-1)) * dzi
        s12 = .125 * ((C(qu, j=1) - C(qu)) * dyi + (C(qv, i=1) - C(qv)) * dxi
                      + (C(qu) - C(qu, j=-1)) * dyi + (C(qv, j=-1, i=1) - C(qv, j=-1)) * dxi
                      + (C(qu, j=1, i=-1) - C(qu, i=-1)) * dyi + (C(qv) - C(qv, i=-1)) * dxi
                      + (C(qu, i=-1) - C(qu, j=-1, i=-1)) * dyi
                      + (C(qv, j=-1) - C(qv, j=-1, i=-1)) * dxi)
        s13 = .125 * ((C(qu, k=1) - C(qu)) * dzi + (C(qw, i=1) - C(qw)) * dxi
                      + (C(qu) - C(qu, k=-1)) * dzi + (C(qw, k=-1, i=1) - C(qw, k=-1)) * dxi
                      + (C(qu, k=1, i=-1) - C(qu, i=-1)) * dzi + (C(qw) - C(qw, i=-1)) * dxi
                      + (C(qu, i=-1) - C(qu, k=-1, i=-1)) * dzi
                      + (C(qw, k=-1) - C(qw, k=-1, i=-1)) * dxi)
        s23 = .125 * ((C(qv, k=1) - C(qv)) * dzi + (C(qw, j=1) - C(qw)) * dyi
                      + (C(qv) - C(qv, k=-1)) * dzi + (C(qw, k=-1, j=1) - C(qw, k=-1)) * dyi
                      + (C(qv, j=-1, k=1) - C(qv, j=-1)) * dzi + (C(qw) - C(qw, j=-1)) * dyi
                      + (C(qv, j=-1) - C(qv, k=-1, j=-1)) * dzi
                      + (C(qw, k=-1) - C(qw, k=-1, j=-1)) * dyi)
        s0 = np.sqrt(2 * (s11**2 + s22**2 + s33**2 + 2 * (s12**2 + s13**2 + s23**2)))
        return s0, [s11, s22, s33, s12, s13, s23]

    s0, sij = strain(u, v, w)
    mij = [filt(s0 * s) for s in sij]
    uf, vf, wf = filt(u), filt(v), filt(w)
    s0f, sijf = strain(uf, vf, wf)
    alph2 = 4.0
    mij = [2.0 * (m - alph2 * s0f * sf) for m, sf in zip(mij, sijf)]
    qu, qv, qw = pw(u), pw(v), pw(w)
    uc = 0.5 * (qu[1:-1, 1:-1, 1:-1] + qu[1:-1, 1:-1, :-2])
    vc = 0.5 * (qv[1:-1, 1:-1, 1:-1] + qv[1:-1, :-2, 1:-1])
    wc = 0.5 * (qw[1:-1, 1:-1, 1:-1] + qw[:-2, 1:-1, 1:-1])
    prods = [uc*uc, vc*vc, wc*wc, uc*vc, uc*wc, vc*wc]
    lij = [filt(p_) for p_ in prods]
    ucf, vcf, wcf = filt(uc), filt(vc), filt(wc)
    fp = [ucf*ucf, vcf*vcf, wcf*wcf, ucf*vcf, ucf*wcf, vcf*wcf]
    lij = [l - f for l, f in zip(lij, fp)]
    num = sum(m*l for m, l in zip(mij[:3], lij[:3])) \
        + 2*sum(m*l for m, l in zip(mij[3:], lij[3:]))
    den = sum(m*m for m in mij[:3]) + 2*sum(m*m for m in mij[3:])
    num_avg = num.mean()
    den_avg = den.mean()
    expect = np.maximum(s0 * num_avg / den_avg, 0.0)
    np.testing.assert_allclose(visct, expect, rtol=1e-10, atol=1e-13)
