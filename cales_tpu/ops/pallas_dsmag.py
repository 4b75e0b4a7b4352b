"""Pallas TPU kernels for the dynamic Smagorinsky model (sgs.f90:153-380).

The XLA expression path materializes ~80 intermediates per call (12 padded
copies, 18 three-stage separable filters, products, extrapolations) and
moves ~9 GB/substep at 256x128x128 — bandwidth-bound at ~840 GB/s but ~15x
the structural traffic.  Two kernel designs live here:

  ONE-PASS (fused_dsmag_onepass, the DEFAULT whenever its tile budget
      fits — see `fused_tiles`; CALES_DSMAG_TWOPASS=1 forces the
      fallback): a single z-march with staged VMEM plane rings — stage A
      computes the 15 source planes (|S|Sij products, centered velocity,
      its products), stage B the 27-point-filtered quantities, stage C the
      test-filter strain + Mij/Lij contraction.  The filtered-velocity
      ghost fill is synthesized in-register (the eligible BC class has
      plane-local/linear recipes; w is never read at k=+1, v never at
      j=+1).  Reads 3 fields, writes 1-3 — vs ~25 words/cell two-pass.

  TWO-PASS (fused_dsmag_level1/level2, fallback when the one-pass ring
      budget doesn't fit):

  DS1 (grid level, fused_dsmag_level1): velocity windows (z +-2) -> strain
      rate s0/sij (strain_rate_core) -> |S|Sij products -> 27-point top-hat
      filter (filter3d, sgs.f90:616-680) of the 6 products, of the
      (wall-extrapolated) velocity, of the center-interpolated velocity
      (interpolate, sgs.f90:850-870), and of its 6 products.  A 3-slot ring
      buffer holds the source planes so each is computed once.  Outputs 16
      fields: fm(6) = filter(|S|Sij), fvel(3), lij(6) = filter(uc_i uc_j)
      - fc_i fc_j (the Leonard term formed in-register, sgs.f90:274-327),
      s0.  fm/lij are stored in `inter_dtype` (bf16 on the aligned f32
      path — see its docstring for the error budget).
  DS2 (test level, fused_dsmag_level2): filtered-velocity windows (z +-1,
      ghost fill via the standard zedge stacks of pad_vel semantics) ->
      strain rate s0f/sijf -> Mij = 2(fm - alph2 s0f sijf) (sgs.f90:198-272)
      -> contraction with lij -> per-row partial sums
      for the homogeneous-direction averaging (ave1d_channel 433-538 /
      ave2d_duct 540-614 / ave0d_dit 388-431 finish outside as a tiny
      reduction), or cell-wise num/den for 'cavity'.

Eligibility (checked by the caller, timeloop): the momentum-kernel
conditions (TPU f32; periodic OR y-walled — duct/cavity ride the ye
bundles; meshes: 1D (gy) slabs since r3, 2D (gy,gx) pencils since r4 via
the 64-lane ppermute'd x-halo extensions `_halo_x` — the filter chain
needs 3-deep x ghosts) plus sgstype='dsmag', the 3D
filter (not filter_2d), no wall model anywhere, and each z face either a
velocity wall (Dirichlet normal component -> product ghosts by
extrapolation, sgs.f90:682-767 with fac_cbc=1) or a homogeneous-Neumann
SGS-scalar fill (ghost == interior, so the padded-product ghost g(a)g(b)
== g(ab) is exact) — see `eligible`.  Periodic z ('dit' class) falls back
to the XLA path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import stencil as st
from .pallas_kernels import (_PlaneAccessor, _pipelined_windows,
                             _COMPILER_PARAMS, _roll_xm, _roll_xp,
                             _np_roll_variant)

NWQ = 15   # ring quantities: 6 |S|Sij products + 3 centered vel + 6 c-products


def ds_tiles(nz, ny, itemsize, nx):
    """Tile picks with the exact budgets of fused_dsmag_level1/level2 — the
    constructor gate must use this so gated shapes never fail in-wrapper."""
    t1 = _pick_tiles_ds(nz, ny, itemsize, nx, nwin=3, nring=NWQ + 1, nio=16)
    t2 = _pick_tiles_ds(nz, ny, itemsize, nx, nwin=3, nring=0, nio=14)
    return None if (t1 is None or t2 is None) else (t1, t2)


def inter_dtype(nz, ny, dt, nx):
    """Storage dtype of the DS1 -> DS2 intermediate fields (fm, lij).

    bf16 on the f32 production path: the dynamic-model contraction is a
    RATIO of plane-averaged Mij*Lij sums, so 2^-8 relative rounding on the
    already-differenced Lij (formed in f32 registers in DS1 — no
    cancellation) and on fm (no cancellation in Mij: the alph2~4 test term
    dominates) perturbs cs^2 by ~0.5% — far inside the model's ~5%
    friction-accuracy bar (sgs.f90:28-30) — while halving 12 of the 32
    full-field HBM streams between the two passes.  fvel and s0 stay f32:
    the test-level strain differentiates fvel (neighbor differences would
    amplify rounding ~10x) and s0 scales visct directly.
    Requires bf16-aligned output tiles (ty % 16) in BOTH passes; kill
    switch CALES_DSMAG_F32=1 for A/B and debugging."""
    import os
    tiles = ds_tiles(nz, ny, np.dtype(dt).itemsize, nx)
    if tiles is None:
        return np.dtype(dt)
    (_, ty1), (_, ty2) = tiles
    if (np.dtype(dt) == np.float32 and ty1 % 16 == 0 and ty2 % 16 == 0
            and os.environ.get('CALES_DSMAG_F32', '') != '1'):
        return np.dtype(jnp.bfloat16)
    return np.dtype(dt)


def eligible(cfg, setup):
    """In-kernel ghost recipes are exact when each non-periodic z (and,
    for the duct/cavity class, y) face is a wall (one-sided extrapolation)
    or a homogeneous-Neumann scalar fill."""
    if cfg.filter_2d:
        return False
    if any(cfg.lwm[ib][d] != 0 for ib in range(2) for d in range(3)):
        return False

    def face_ok(d):
        """Non-wall faces along direction d must be homogeneous-N fills
        (ghost == interior for scalars and wall-parallel velocity) with a
        zero-Dirichlet normal component."""
        for ib in range(2):
            if setup.wall_flags[(ib, d)]:
                continue
            if cfg.cbcsgs[ib][d] != 'N' or float(cfg.bcsgs[ib][d]) != 0.0:
                return False
            for iv in range(3):
                want = 'D' if iv == d else 'N'
                if (cfg.cbcvel[ib][d][iv] != want
                        or float(cfg.bcvel[ib][d][iv]) != 0.0):
                    return False
        return True

    if not face_ok(2):
        return False
    y_periodic = all(cfg.cbcvel[ib][1][iv] == 'P'
                     for ib in range(2) for iv in range(3))
    if not y_periodic and not face_ok(1):
        return False
    return True


def _roll_x(p, i, interpret):
    if i == 0:
        return p
    if interpret:
        return _np_roll_variant(p, i)
    return _roll_xp(p) if i == 1 else _roll_xm(p)


def _zwin2_copies(fint, zedge, scr, sem, z0, y0, ny, tz, ty, case,
                  y_ext=False, mode='tile'):
    """+-2 z window: rows w = 0..tz+3 hold interior z row z0-2+w; the ghost
    rows g=-1 (w with z0=0 -> w=1) and g=nz come from the edge stack.  Valid
    for fills that do not rewrite the padded-row-nz slot (the corrected
    velocity fill).  y_ext: see pallas_kernels._zwin_copies.  mode='ally':
    full-y-extent bundle source (the 16-row y-edge bundle);
    mode=('strips', yh, yhz, base, ycase): sharded halo strips (see
    pallas_kernels._zwin_copies)."""
    strips = isinstance(mode, tuple)
    if strips:
        _, yh, yhz, sbase, ycase = mode

    def ycop(src, sz, rows, dr, b):
        if mode == 'ally':
            return [
                pltpu.make_async_copy(src.at[pl.ds(sz, rows)],
                                      scr.at[pl.ds(dr, rows)], sem.at[b]),
            ]
        y0a = pl.multiple_of(y0, 8)
        if y_ext:
            return [
                pltpu.make_async_copy(
                    src.at[pl.ds(sz, rows), pl.ds(y0a, ty + 16)],
                    scr.at[pl.ds(dr, rows)], sem.at[b]),
            ]
        ylo = pl.multiple_of((y0 - 8) % ny, 8)
        yhi = pl.multiple_of((y0 + ty) % ny, 8)
        if strips:
            hsrc = yhz if src is zedge else yh
            if ycase in ('lo', 'both'):
                lo_c = pltpu.make_async_copy(
                    hsrc.at[pl.ds(sz, rows), sbase:sbase + 8],
                    scr.at[pl.ds(dr, rows), 0:8], sem.at[b])
            else:
                lo_c = pltpu.make_async_copy(
                    src.at[pl.ds(sz, rows), pl.ds(ylo, 8)],
                    scr.at[pl.ds(dr, rows), 0:8], sem.at[b])
            if ycase in ('hi', 'both'):
                hi_c = pltpu.make_async_copy(
                    hsrc.at[pl.ds(sz, rows), sbase + 8:sbase + 16],
                    scr.at[pl.ds(dr, rows), 8 + ty:16 + ty], sem.at[b + 2])
            else:
                hi_c = pltpu.make_async_copy(
                    src.at[pl.ds(sz, rows), pl.ds(yhi, 8)],
                    scr.at[pl.ds(dr, rows), 8 + ty:16 + ty], sem.at[b + 2])
            return [
                lo_c,
                pltpu.make_async_copy(src.at[pl.ds(sz, rows),
                                             pl.ds(y0a, ty)],
                                      scr.at[pl.ds(dr, rows), 8:8 + ty],
                                      sem.at[b + 1]),
                hi_c,
            ]
        return [
            pltpu.make_async_copy(src.at[pl.ds(sz, rows), pl.ds(ylo, 8)],
                                  scr.at[pl.ds(dr, rows), 0:8], sem.at[b]),
            pltpu.make_async_copy(src.at[pl.ds(sz, rows), pl.ds(y0a, ty)],
                                  scr.at[pl.ds(dr, rows), 8:8 + ty],
                                  sem.at[b + 1]),
            pltpu.make_async_copy(src.at[pl.ds(sz, rows), pl.ds(yhi, 8)],
                                  scr.at[pl.ds(dr, rows), 8 + ty:16 + ty],
                                  sem.at[b + 2]),
        ]

    tzc = scr.shape[0] - 4
    if case == 'single':
        return (ycop(zedge, 0, 1, 1, 0) + ycop(fint, 0, tzc, 2, 3)
                + ycop(zedge, 2, 1, tzc + 2, 6))
    if case == 'lo':
        # rows 2..tz+3 <- interior 0..tz+1; row 1 <- ghost g=-1
        return ycop(zedge, 0, 1, 1, 0) + ycop(fint, 0, tzc + 2, 2, 3)
    if case == 'hi':
        # rows 0..tz+1 <- interior z0-2..nz-1; row tz+2 <- ghost g=nz
        return (ycop(fint, z0 - 2, tzc + 2, 0, 0)
                + ycop(zedge, 2, 1, tzc + 2, 3))
    return ycop(fint, z0 - 2, tzc + 4, 0, 0)


def _assemble_windows2(fields, k, z0, y0, ny, nz, tz, ty, action,
                       y_ext=False):
    klast = nz // tz - 1
    gj = ny // ty
    has_strips = any(len(e) > 4 and isinstance(e[4], tuple) for e in fields)

    def run(case, ycase=None):
        for entry in fields:
            fint, zedge, scr, sem = entry[:4]
            mode = entry[4] if len(entry) > 4 else 'tile'
            if isinstance(mode, tuple):
                mode = mode + (ycase,)
            for c in _zwin2_copies(fint, zedge, scr, sem, z0, y0, ny, tz, ty,
                                   case, y_ext=y_ext, mode=mode):
                getattr(c, action)()

    def run_y(case):
        if not has_strips:
            run(case)
            return
        if gj == 1:
            run(case, 'both')
            return
        jj = jax.lax.div(jnp.asarray(y0, jnp.int32),
                         jnp.asarray(ty, jnp.int32))

        @pl.when(jj == 0)
        def _():
            run(case, 'lo')

        @pl.when(jnp.logical_and(jj > 0, jj < gj - 1))
        def _():
            run(case, 'wrap')

        @pl.when(jj == gj - 1)
        def _():
            run(case, 'hi')

    if klast == 0:
        run_y('single')
        return

    @pl.when(k == 0)
    def _():
        run_y('lo')

    @pl.when(jnp.logical_and(k > 0, k < klast))
    def _():
        run_y('mid')

    @pl.when(k == klast)
    def _():
        run_y('hi')


def _pipelined_windows2(specs, sems, nz, ny, tz, ty, k, j, interpret,
                        y_ext=False):
    """Double-buffered +-2-window prefetch (same scheme as
    pallas_kernels._pipelined_windows, with the _assemble_windows2 layout)."""
    gj = ny // ty
    T = (nz // tz) * gj
    t = k * gj + j

    def assemble(tt, sl, action):
        gj_t = jnp.asarray(gj, jnp.int32)
        k2 = jax.lax.div(jnp.asarray(tt, jnp.int32), gj_t)
        j2 = jax.lax.rem(jnp.asarray(tt, jnp.int32), gj_t)
        fields = [(s[0], s[1], s[2].at[sl], sems.at[sl, m]) + tuple(s[3:])
                  for m, s in enumerate(specs)]
        _assemble_windows2(fields, k2, k2 * tz, j2 * ty, ny, nz, tz, ty,
                           action, y_ext=y_ext)

    if interpret:
        assemble(t, 0, 'start')
        assemble(t, 0, 'wait')
        return [s[2].at[0] for s in specs]

    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        assemble(t, slot, 'start')

    assemble(t, slot, 'wait')

    @pl.when(t + 1 < T)
    def _():
        assemble(t + 1, jax.lax.rem(t + 1, 2), 'start')

    return [s[2].at[slot] for s in specs]


def _pick_tiles_ds(nz, ny, itemsize, nx, nwin, nring, nio):
    if ny < 8 or ny % 8:
        return None
    for tz, ty in ((8, 32), (8, 16), (4, 16), (4, 8), (2, 8)):
        if nz % tz or ny % ty or tz < 2:
            continue
        win = (tz + 4) * (ty + 16) * nx * itemsize
        ringb = nring * 3 * (ty + 14) * nx * itemsize
        outs = tz * ty * nx * itemsize
        tot = nwin * win + ringb + 2 * nio * outs
        if tot < 72 * 1024 * 1024:
            return tz, ty
    return None


def _ds1_kernel(tz, ty, nz, ny, nx, dxi, dyi, wall_lo, wall_hi, interpret,
                y_ext=False, ywalls=None, has_ystrips=False, has_ywf=False,
                inter_dt=None):
    """Ghost recipes (gated by `eligible`): 'wall' -> 2 q0 - q1, else
    ghost == nearest interior plane.

    ywalls: None (y periodic) or (lo_is_wall, hi_is_wall) — y non-periodic:
    the velocity windows' wall-tile ghost rows are fixed from the 16-row
    y-edge bundle (fill ghosts), source planes get the same
    extrapolate-or-copy ghost recipe in y as in z, and the wall-parallel
    filter-input velocities (u, w) are one-sided extrapolated at y walls
    (sgs.f90:682-767 for idir=2)."""
    klast = nz // tz - 1
    has_ye = ywalls is not None
    gj = ny // ty

    def kernel(dzci_s, dzfi_s, u, v, w, ue, ve, we, *rest):
        rest = list(rest)
        ye = yze = yh = yhz = ywf_s = None
        if has_ye:
            ye, yze = rest[0], rest[1]
            del rest[0:2]
        if has_ystrips:
            yh, yhz = rest[0], rest[1]
            del rest[0:2]
        if has_ywf:
            ywf_s = rest.pop(0)
        (fm0, fm1, fm2, fm3, fm4, fm5, fu_o, fv_o, fw_o,
         l0, l1, l2, l3, l4, l5, s0_o) = rest[0:16]
        del rest[0:16]
        su2, sv2, sw2 = rest[0:3]
        del rest[0:3]
        sye2 = rest.pop(0) if has_ye else None
        ring, s0ring, sems = rest[0:3]
        k = pl.program_id(0)
        j = pl.program_id(1)
        z0 = k * tz
        specs = [(u, ue, su2), (v, ve, sv2), (w, we, sw2)]
        if has_ystrips:
            specs = [e + (('strips', yh, yhz, 16 * m),)
                     for m, e in enumerate(specs)]
        if has_ye:
            specs.append((ye, yze, sye2, 'ally'))
        wins_l = _pipelined_windows2(specs, sems, nz, ny, tz, ty, k, j,
                                     interpret, y_ext=y_ext)
        su, sv, sw = wins_l[0:3]
        sye = wins_l[3] if has_ye else None
        fm_o = (fm0, fm1, fm2, fm3, fm4, fm5)
        lij_o = (l0, l1, l2, l3, l4, l5)
        idt = inter_dt
        wins = {id(su): su, id(sv): sv, id(sw): sw}
        ybase = {id(su): 0, id(sv): 3, id(sw): 6}
        y_lo_t = (j == 0) if has_ye else None
        y_hi_t = (j == gj - 1) if has_ye else None
        if has_ye and has_ywf:
            # sharded y-walled runs: wall fixes fire only on the shard
            # owning the wall (see pallas_kernels.fused_mom_rk ywf note)
            y_lo_t = y_lo_t & (ywf_s[0, 0] > 0.5)
            y_hi_t = y_hi_t & (ywf_s[0, 1] > 0.5)

        def _riota(shape):
            return jax.lax.broadcasted_iota(jnp.int32, shape, 0)

        def row(P, lg):
            """window plane of interior z row z0+lg (lg traced, >= -2);
            y-walled runs fix the wall tiles' ghost rows from the bundle."""
            p = wins[id(P)][2 + lg]
            if has_ye:
                yp = sye[2 + lg]
                b = ybase[id(P)]
                r = _riota(p.shape)
                p = jnp.where((r == 7) & y_lo_t, yp[b:b + 1], p)
                p = jnp.where((r == 8 + ty) & y_hi_t, yp[b + 1:b + 2], p)
            return p

        def compute_source(r):
            """NWQ source planes + s0 at interior row z0+r (traced r),
            width ty+14 (rows m <-> global y = y0-7+m)."""
            gz = z0 + r + 1   # padded z index for the metrics

            def Vs(P, k=0, j=0, i=0):
                p = _roll_x(row(P, r + k), i, interpret)
                return p[1 + j:ty + 15 + j]
            metrics = {
                'dzci_c': dzci_s[gz, 0],
                'dzci_m': dzci_s[gz - 1, 0],
                'dzfi_c': dzfi_s[gz, 0],
            }
            s0r, sij = st.strain_rate_core(Vs, metrics.__getitem__,
                                           su, sv, sw, dxi, dyi,
                                           with_sij=True)
            up0 = _roll_x(row(su, r), -1, interpret)
            uc = 0.5 * (row(su, r)[1:ty + 15] + up0[1:ty + 15])
            vp0 = row(sv, r)
            vc = 0.5 * (vp0[1:ty + 15] + vp0[0:ty + 14])
            wc = 0.5 * (row(sw, r)[1:ty + 15] + row(sw, r - 1)[1:ty + 15])
            planes = [s0r * sq for sq in sij]
            planes += [uc, vc, wc]
            planes += [uc * uc, vc * vc, wc * wc, uc * vc, uc * wc, vc * wc]
            return planes, s0r

        def yfix_src(zf):
            """y-ghost recipe on a width-(ty+14) source plane (rows m <->
            global y0-7+m; ghosts at m=6 and m=ty+7): extrapolate at y
            walls, copy at homogeneous-N faces — linear in each axis, so
            applying it after the z filter commutes with the reference's
            extrapolate-then-filter order."""
            if not has_ye:
                return zf
            r = _riota(zf.shape)
            glo = 2.0 * zf[7:8] - zf[8:9] if ywalls[0] else zf[7:8]
            zf = jnp.where((r == 6) & y_lo_t, glo, zf)
            ghi = (2.0 * zf[ty + 6:ty + 7] - zf[ty + 5:ty + 6]
                   if ywalls[1] else zf[ty + 6:ty + 7])
            return jnp.where((r == ty + 7) & y_hi_t, ghi, zf)

        def filt_src(pm, pc, pp):
            """filter3d on width-(ty+14) source planes -> (ty, nx)."""
            zf = yfix_src(0.25 * (pm + 2.0 * pc + pp))
            q = 0.25 * (_roll_x(zf, -1, interpret) + 2.0 * zf
                        + _roll_x(zf, 1, interpret))
            q = 0.25 * (q[:-2] + 2.0 * q[1:-1] + q[2:])   # width ty+12
            return q[6:6 + ty]

        def vel_row(P, lg, parallel, parallel_y=False):
            """filter-input velocity plane at interior row z0+lg: the wall
            faces use the one-sided extrapolation for the wall-parallel
            components (extrapolate skips the normal component's own
            direction, sgs.f90:700-707); same per component in y."""
            p = row(P, lg)
            if parallel and wall_lo:
                p = jnp.where(jnp.logical_and(k == 0, lg == -1),
                              2.0 * row(P, 0) - row(P, 1), p)
            if parallel and wall_hi:
                p = jnp.where(jnp.logical_and(k == klast, lg == tz),
                              2.0 * row(P, tz - 1) - row(P, tz - 2), p)
            if has_ye and parallel_y:
                r = _riota(p.shape)
                if ywalls[0]:
                    p = jnp.where((r == 7) & y_lo_t,
                                  2.0 * p[8:9] - p[9:10], p)
                if ywalls[1]:
                    p = jnp.where((r == 8 + ty) & y_hi_t,
                                  2.0 * p[7 + ty:8 + ty] - p[6 + ty:7 + ty],
                                  p)
            return p

        def filt_vel(P, kk, parallel, parallel_y=False):
            """filter3d of the velocity window -> (ty, nx) at row kk."""
            zf = 0.25 * (vel_row(P, kk - 1, parallel, parallel_y)
                         + 2.0 * vel_row(P, kk, parallel, parallel_y)
                         + vel_row(P, kk + 1, parallel, parallel_y))
            q = 0.25 * (_roll_x(zf, -1, interpret) + 2.0 * zf
                        + _roll_x(zf, 1, interpret))
            q = 0.25 * (q[:-2] + 2.0 * q[1:-1] + q[2:])   # width ty+14
            return q[7:7 + ty]

        def body(t, carry):
            # source step: compute ring planes at row r = t-1 (clipped into
            # the domain; the out-of-range plane of an edge tile is replaced
            # by the ghost recipe at emission and never used otherwise)
            r = t - 1
            r_c = jnp.clip(z0 + r, 0, nz - 1) - z0
            planes, s0r = compute_source(r_c)
            slot = jax.lax.rem(t, 3)
            for q in range(NWQ):
                ring[slot, q] = planes[q]
            s0ring[slot] = s0r

            @pl.when(t >= 2)
            def _():
                kk = t - 2
                sm, sc2, sp2 = (jax.lax.rem(t - 2, 3), jax.lax.rem(t - 1, 3),
                                slot)
                is_lo = jnp.logical_and(k == 0, kk == 0)
                is_hi = jnp.logical_and(k == klast, kk == tz - 1)
                outs = []
                for q in range(NWQ):
                    pm = ring[sm, q]
                    pc = ring[sc2, q]
                    pp = ring[sp2, q]
                    glo = 2.0 * pc - pp if wall_lo else pc
                    ghi = 2.0 * pc - pm if wall_hi else pc
                    pm = jnp.where(is_lo, glo, pm)
                    pp = jnp.where(is_hi, ghi, pp)
                    outs.append(filt_src(pm, pc, pp))
                for q in range(6):
                    fm_o[q][kk] = outs[q].astype(idt)
                # Lij = filter(uc_i uc_j) - fc_i fc_j formed here in full
                # registers (sgs.f90:274-327): both terms are DS1 filter
                # outputs, so emitting the difference drops the 3 fc fields
                # from the DS1->DS2 round trip bit-identically and keeps
                # the small Leonard term cancellation-free when the
                # intermediates are stored in bf16 (inter_dtype)
                fc = outs[6:9]
                cps = (fc[0] * fc[0], fc[1] * fc[1], fc[2] * fc[2],
                       fc[0] * fc[1], fc[0] * fc[2], fc[1] * fc[2])
                for q in range(6):
                    lij_o[q][kk] = (outs[9 + q] - cps[q]).astype(idt)
                fu_o[kk] = filt_vel(su, kk, True, parallel_y=True)
                fv_o[kk] = filt_vel(sv, kk, True, parallel_y=False)
                fw_o[kk] = filt_vel(sw, kk, False, parallel_y=True)
                s0_o[kk] = s0ring[sc2][7:7 + ty]
            return carry

        jax.lax.fori_loop(0, tz + 2, body, 0)
    return kernel


def fused_dsmag_level1(u, v, w, ue, ve, we, dzci, dzfi, dxi, dyi,
                       wall_lo, wall_hi, interpret=False, y_ext=False,
                       ye=None, yze=None, ywalls=None, ystrips=None,
                       ywf=None):
    """DS1: returns (fm[6], fvel[3], lij[6], s0) interiors or None.
    fm and lij are stored in `inter_dtype` (bf16 on the aligned f32 path).

    u, v, w: corrected-fill velocity interiors; ue, ve, we: their z-edge
    stacks (is_correc fill — no wall-face rewrite, required by the +-2
    window assembly).  y_ext: see pallas_kernels.fused_mom_rk.
    ye/yze + ywalls: 16-row y-edge bundle of the same fill (rows 3m per
    field in u, v, w order) + per-side y-wall flags for non-periodic y
    (duct/cavity class)."""
    nz, ny, nx = u.shape
    if y_ext:
        ny -= 16
    dt = u.dtype
    if nx % 128 or ny % 8:
        return None
    tiles = (ds_tiles(nz, ny, dt.itemsize, nx) or (None,))[0]
    if tiles is None:
        return None
    tz, ty = tiles
    if nz % tz or nz < tz:
        return None
    dzci_s = jnp.asarray(dzci, dt).reshape(-1, 1)
    dzfi_s = jnp.asarray(dzfi, dt).reshape(-1, 1)
    has_ye = ye is not None
    has_ystrips = ystrips is not None
    has_ywf = ywf is not None
    yargs = (ye, yze) if has_ye else ()
    sargs = tuple(ystrips) if has_ystrips else ()
    wargs = ((jnp.stack([jnp.asarray(ywf[0], dt),
                         jnp.asarray(ywf[1], dt)]).reshape(1, 2),)
             if has_ywf else ())
    grid = (nz // tz, ny // ty)
    int_spec = pl.BlockSpec((tz, ty, nx), lambda k, j: (k, j, 0))
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    idt = inter_dtype(nz, ny, dt, nx)
    kern = _ds1_kernel(tz, ty, nz, ny, nx, float(dxi), float(dyi),
                       bool(wall_lo), bool(wall_hi), interpret, y_ext=y_ext,
                       ywalls=ywalls if has_ye else None,
                       has_ystrips=has_ystrips, has_ywf=has_ywf,
                       inter_dt=idt)
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[smem_spec, smem_spec]
                 + [any_spec] * (6 + 2 * has_ye + 2 * has_ystrips)
                 + [smem_spec] * has_ywf,
        out_specs=[int_spec] * 16,
        out_shape=[jax.ShapeDtypeStruct((nz, ny, nx), idt)] * 6
                  + [jax.ShapeDtypeStruct((nz, ny, nx), dt)] * 3
                  + [jax.ShapeDtypeStruct((nz, ny, nx), idt)] * 6
                  + [jax.ShapeDtypeStruct((nz, ny, nx), dt)],
        scratch_shapes=[pltpu.VMEM((2, tz + 4, ty + 16, nx), dt)
                        for _ in range(3)]
                       + ([pltpu.VMEM((2, tz + 4, 16, nx), dt)]
                          if has_ye else [])
                       + [pltpu.VMEM((3, NWQ, ty + 14, nx), dt),
                          pltpu.VMEM((3, ty + 14, nx), dt),
                          pltpu.SemaphoreType.DMA((2, 3 + has_ye, 9))],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(dzci_s, dzfi_s, u, v, w, ue, ve, we, *yargs, *sargs, *wargs)
    return outs[0:6], outs[6:9], outs[9:15], outs[15]


def _ds2_kernel(tz, ty, nz, ny, nx, dxi, dyi, avg, interpret, y_ext=False,
                ywalls=None, has_ystrips=False, has_ywf=False):
    has_ye = ywalls is not None
    gj = ny // ty

    def kernel(alph2_s, dzci_s, dzfi_s, fu, fv, fw, fue, fve, fwe, *rest):
        rest = list(rest)
        ye = yze = yh = yhz = ywf_s = None
        if has_ye:
            ye, yze = rest[0], rest[1]
            del rest[0:2]
        if has_ystrips:
            yh, yhz = rest[0], rest[1]
            del rest[0:2]
        if has_ywf:
            ywf_s = rest.pop(0)
        (fm0, fm1, fm2, fm3, fm4, fm5,
         l0, l1, l2, l3, l4, l5, s0_i) = rest[0:13]
        del rest[0:13]
        if avg == 'cavity':
            visct_o = rest.pop(0)
            num_o = den_o = None
        else:
            num_o, den_o = rest[0:2]
            del rest[0:2]
        su2, sv2, sw2 = rest[0:3]
        del rest[0:3]
        sye2 = rest.pop(0) if has_ye else None
        sems = rest[-1]
        k = pl.program_id(0)
        j = pl.program_id(1)
        z0 = k * tz
        specs = [(fu, fue, su2), (fv, fve, sv2), (fw, fwe, sw2)]
        if has_ystrips:
            specs = [e + (('strips', yh, yhz, 16 * m),)
                     for m, e in enumerate(specs)]
        if has_ye:
            specs.append((ye, yze, sye2, 'ally'))
        wins = _pipelined_windows(specs, sems, nz, ny, tz, ty, k, j,
                                  interpret, y_ext=y_ext)
        su, sv, sw = wins[0:3]
        sye = wins[3] if has_ye else None
        y_lo_t = (j == 0) if has_ye else None
        y_hi_t = (j == gj - 1) if has_ye else None
        if has_ye and has_ywf:
            y_lo_t = y_lo_t & (ywf_s[0, 0] > 0.5)
            y_hi_t = y_hi_t & (ywf_s[0, 1] > 0.5)
        fm_i = (fm0, fm1, fm2, fm3, fm4, fm5)
        lij_i = (l0, l1, l2, l3, l4, l5)

        def body(kk, carry):
            kz = z0 + kk + 1
            acc = _PlaneAccessor({id(su): su, id(sv): sv, id(sw): sw},
                                 kk, ty, interpret=interpret,
                                 ye=sye,
                                 ylane={id(su): 0, id(sv): 3, id(sw): 6},
                                 ystag={id(sv)}, y_lo=y_lo_t, y_hi=y_hi_t)
            metrics = {
                'dzci_c': dzci_s[kz, 0],
                'dzci_m': dzci_s[kz - 1, 0],
                'dzfi_c': dzfi_s[kz, 0],
            }
            s0f, sijf = st.strain_rate_core(acc.V, metrics.__getitem__,
                                            su, sv, sw, dxi, dyi,
                                            with_sij=True)
            a2 = alph2_s[kz, 0]
            if has_ye and (ywalls[0] or ywalls[1]):
                # first off-wall y layer has the 2.52 filter ratio
                # (cmpt_alph2, sgs.f90:769-822)
                rt = jax.lax.broadcasted_iota(jnp.int32, (ty, nx), 0)
                if ywalls[0]:
                    a2 = jnp.where((rt == 0) & y_lo_t, 2.52, a2)
                if ywalls[1]:
                    a2 = jnp.where((rt == ty - 1) & y_hi_t, 2.52, a2)
            cdt = s0f.dtype
            mij = [2.0 * (fm_i[q][kk].astype(cdt) - a2 * s0f * sijf[q])
                   for q in range(6)]
            lij = [lij_i[q][kk].astype(cdt) for q in range(6)]
            num = (mij[0] * lij[0] + mij[1] * lij[1] + mij[2] * lij[2]
                   + 2.0 * (mij[3] * lij[3] + mij[4] * lij[4]
                            + mij[5] * lij[5]))
            den = (mij[0] * mij[0] + mij[1] * mij[1] + mij[2] * mij[2]
                   + 2.0 * (mij[3] * mij[3] + mij[4] * mij[4]
                            + mij[5] * mij[5]))
            if avg == 'cavity':
                visct_o[kk] = jnp.maximum(s0_i[kk] * num / den, 0.0)
            elif avg == 'duct':
                num_o[kk] = jnp.sum(num, axis=-1, keepdims=True)
                den_o[kk] = jnp.sum(den, axis=-1, keepdims=True)
            else:   # 'channel' / 'dit': per-z-row plane sums, broadcast over
                    # one (8, 128) register tile (Mosaic requires 8/128-
                    # aligned output blocks; the caller reads [.., 0, 0])
                num_o[kk] = jnp.broadcast_to(jnp.sum(num).reshape(1, 1),
                                             (8, 128))
                den_o[kk] = jnp.broadcast_to(jnp.sum(den).reshape(1, 1),
                                             (8, 128))
            return carry

        jax.lax.fori_loop(0, tz, body, 0)
    return kernel


def fused_dsmag_level2(fu, fv, fw, fue, fve, fwe, fm, lij, s0,
                       alph2_1d, dzci, dzfi, dxi, dyi, avg,
                       interpret=False, y_ext=False,
                       ye=None, yze=None, ywalls=None, ystrips=None,
                       ywf=None):
    """DS2: Mij/Lij contraction from the DS1 outputs (fm/lij may arrive in
    inter_dtype bf16; the contraction runs in the compute dtype).

    fue..fwe: zedge stacks of the filtered-velocity BC fill (pad_vel
    semantics, is_correc=False — the wall-face rewrite rides in row 1).
    Returns visct (avg='cavity') or (num_part, den_part): (nz, ny) for
    'duct', (nz, gy) per-y-tile row sums for 'channel'/'dit'.
    y_ext: fu..fwe carry the y halos; fm/fc/fl/s0 and outputs stay
    interior-sized."""
    nz, ny, nx = fu.shape
    if y_ext:
        ny -= 16
    dt = fu.dtype
    if nx % 128 or ny % 8:
        return None
    tiles = (ds_tiles(nz, ny, dt.itemsize, nx) or (None, None))[1]
    if tiles is None:
        return None
    tz, ty = tiles
    alph2_s = jnp.zeros((nz + 2, 1), dt).at[1:nz + 1, 0].set(
        jnp.asarray(alph2_1d, dt))
    dzci_s = jnp.asarray(dzci, dt).reshape(-1, 1)
    dzfi_s = jnp.asarray(dzfi, dt).reshape(-1, 1)
    has_ye = ye is not None
    has_ystrips = ystrips is not None
    has_ywf = ywf is not None
    yargs = (ye, yze) if has_ye else ()
    sargs = tuple(ystrips) if has_ystrips else ()
    wargs = ((jnp.stack([jnp.asarray(ywf[0], dt),
                         jnp.asarray(ywf[1], dt)]).reshape(1, 2),)
             if has_ywf else ())
    grid = (nz // tz, ny // ty)
    int_spec = pl.BlockSpec((tz, ty, nx), lambda k, j: (k, j, 0))
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    kern = _ds2_kernel(tz, ty, nz, ny, nx, float(dxi), float(dyi), avg,
                       interpret, y_ext=y_ext,
                       ywalls=ywalls if has_ye else None,
                       has_ystrips=has_ystrips, has_ywf=has_ywf)
    if avg == 'cavity':
        out_specs = int_spec
        out_shape = jax.ShapeDtypeStruct((nz, ny, nx), dt)
    elif avg == 'duct':
        out_specs = [pl.BlockSpec((tz, ty, 1), lambda k, j: (k, j, 0))] * 2
        out_shape = [jax.ShapeDtypeStruct((nz, ny, 1), dt)] * 2
    else:
        gy = ny // ty
        out_specs = [pl.BlockSpec((tz, 8, 128), lambda k, j: (k, j, 0))] * 2
        out_shape = [jax.ShapeDtypeStruct((nz, gy * 8, 128), dt)] * 2
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[smem_spec] * 3
                 + [any_spec] * (6 + 2 * has_ye + 2 * has_ystrips)
                 + [smem_spec] * has_ywf
                 + [int_spec] * 13,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((2, tz + 2, ty + 16, nx), dt)
                        for _ in range(3)]
                       + ([pltpu.VMEM((2, tz + 2, 16, nx), dt)]
                          if has_ye else [])
                       + [pltpu.SemaphoreType.DMA((2, 3 + has_ye, 9))],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(alph2_s, dzci_s, dzfi_s, fu, fv, fw, fue, fve, fwe, *yargs, *sargs,
      *wargs, *fm, *lij, s0)


def fused_tiles(nz, ny, itemsize, nx):
    """Tile pick for the single-pass kernel (fused_dsmag_onepass): DS1's
    +-2 windows and source ring plus the in-VMEM filtered-quantity rings,
    but almost no output pipeline (s0 + visct-or-partials instead of 16
    intermediate fields).  Windows counted at their true 2-slot size."""
    if ny < 8 or ny % 8:
        return None
    # larger tz first: the kernel is VPU-bound and each (k, j) tile pays
    # a (tz+2)/tz warmup-row overhead in stages A/B (measured: the whole
    # pipeline runs ~8 ms/substep at 512x256x256 f32, ~9x its HBM floor).
    # Round-5 sweep at that shape (duct row): (64,64) 0.4685 <
    # (32,128) 0.4729 < (32,64) 0.4736 ns/cell/substep — tz=64 halves the
    # warmup replay; ty=128 loses more to VMEM pressure than the smaller
    # y-halo overread buys
    cands = ((64, 64), (32, 64), (16, 64), (8, 64), (16, 32), (8, 32),
             (8, 16), (4, 16), (4, 8), (2, 8))
    import os
    pref = os.environ.get('CALES_DSMAG_TILES', '')
    if pref:
        # bench override, e.g. CALES_DSMAG_TILES=64x64: divisibility-
        # checked but TRUSTED past the conservative budget model below —
        # Mosaic's own VMEM check is the arbiter for experimental picks
        tzp, typ = (int(s) for s in pref.split('x'))
        if nz % tzp == 0 and ny % typ == 0 and tzp >= 2:
            return tzp, typ
    for tz, ty in cands:
        if nz % tz or ny % ty or tz < 2:
            continue
        win = 2 * (tz + 4) * (ty + 16) * nx * itemsize
        ringb = (NWQ + 1) * 3 * (ty + 14) * nx * itemsize
        fringb = (3 * (ty + 2) + 12 * ty) * 3 * nx * itemsize
        outs = tz * ty * nx * itemsize
        if 3 * win + ringb + fringb + 2 * 2 * outs < 72 * 1024 * 1024:
            return tz, ty
    return None


def _ds_onepass_kernel(tz, ty, nz, ny, nx, dxi, dyi, wall_lo, wall_hi, avg,
                       interpret, y_ext=False, ywalls=None,
                       has_ystrips=False, has_ywf=False, x_interior=None,
                       zvals=(0.0, 0.0, 0.0, 0.0),
                       yvals=(0.0, 0.0, 0.0, 0.0), fold_ratio=False):
    """The whole Germano-Lilly pipeline in ONE z-march: stage A computes
    the NWQ source planes (DS1's ring), stage B the 15 filtered quantities
    (fm, lij in full registers, fvel at width ty+2) into VMEM rings, and
    stage C the test-level strain + Mij/Lij contraction -- no intermediate
    field ever touches HBM.  The filtered-velocity BC fill (bounduvw on
    the filtered field, sgs.f90:256-257) is synthesized in-register: the
    eligible class (see `eligible`) makes every recipe plane-local and
    linear -- z/y ghosts are +-1 times the first interior plane ('D' 0
    wall / 'N' 0), the staggered wall faces are 0 -- and the test-level
    strain never reads w at k=+1 nor v at j=+1, so the padded nz+1/ny+1
    rows of the staggered components are never needed.  Corner semantics
    (z recipe applied to y-fixed rows) match boundary._zedge_of_yrows."""
    klast = nz // tz - 1
    has_ye = ywalls is not None
    gj = ny // ty
    szlo = -1.0 if wall_lo else 1.0
    szhi = -1.0 if wall_hi else 1.0
    sylo = syhi = 1.0
    if has_ye:
        sylo = -1.0 if ywalls[0] else 1.0
        syhi = -1.0 if ywalls[1] else 1.0
    # value offsets of the filtered-velocity ghost recipes ('D' b: ghost
    # = 2b - q, e.g. a moving lid): zvals = (u_lo, u_hi, v_lo, v_hi) at
    # the z faces, yvals = (u_lo, u_hi, w_lo, w_hi) at the y faces;
    # nonzero only on wall faces (static scalar BCs, baked as constants)
    zoff_lo = {0: 2.0 * zvals[0] if wall_lo else 0.0,
               1: 2.0 * zvals[2] if wall_lo else 0.0}
    zoff_hi = {0: 2.0 * zvals[1] if wall_hi else 0.0,
               1: 2.0 * zvals[3] if wall_hi else 0.0}
    yoff_lo = {0: 0.0, 2: 0.0}
    yoff_hi = {0: 0.0, 2: 0.0}
    if has_ye:
        yoff_lo = {0: 2.0 * yvals[0] if ywalls[0] else 0.0,
                   2: 2.0 * yvals[2] if ywalls[0] else 0.0}
        yoff_hi = {0: 2.0 * yvals[1] if ywalls[1] else 0.0,
                   2: 2.0 * yvals[3] if ywalls[1] else 0.0}

    def kernel(alph2_s, dzci_s, dzfi_s, u, v, w, ue, ve, we, *rest):
        rest = list(rest)
        ye = yze = yh = yhz = ywf_s = None
        if has_ye:
            ye, yze = rest[0], rest[1]
            del rest[0:2]
        if has_ystrips:
            yh, yhz = rest[0], rest[1]
            del rest[0:2]
        if has_ywf:
            ywf_s = rest.pop(0)
        if avg == 'cavity' or fold_ratio:
            visct_o = rest.pop(0)
            s0_o = num_o = den_o = None
        else:
            visct_o = None
            s0_o, num_o, den_o = rest[0:3]
            del rest[0:3]
        su2, sv2, sw2 = rest[0:3]
        del rest[0:3]
        sye2 = rest.pop(0) if has_ye else None
        ring, s0ring, fvr, fqr, sems = rest[0:5]
        k = pl.program_id(0)
        j = pl.program_id(1)
        z0 = k * tz
        specs = [(u, ue, su2), (v, ve, sv2), (w, we, sw2)]
        if has_ystrips:
            specs = [e + (('strips', yh, yhz, 16 * m),)
                     for m, e in enumerate(specs)]
        if has_ye:
            specs.append((ye, yze, sye2, 'ally'))
        wins_l = _pipelined_windows2(specs, sems, nz, ny, tz, ty, k, j,
                                     interpret, y_ext=y_ext)
        su, sv, sw = wins_l[0:3]
        sye = wins_l[3] if has_ye else None
        wins = {id(su): su, id(sv): sv, id(sw): sw}
        ybase = {id(su): 0, id(sv): 3, id(sw): 6}
        y_lo_t = (j == 0) if has_ye else None
        y_hi_t = (j == gj - 1) if has_ye else None
        if has_ye and has_ywf:
            y_lo_t = y_lo_t & (ywf_s[0, 0] > 0.5)
            y_hi_t = y_hi_t & (ywf_s[0, 1] > 0.5)

        def _riota(shape):
            return jax.lax.broadcasted_iota(jnp.int32, shape, 0)

        def row(P, lg):
            p = wins[id(P)][2 + lg]
            if has_ye:
                yp = sye[2 + lg]
                b = ybase[id(P)]
                r = _riota(p.shape)
                p = jnp.where((r == 7) & y_lo_t, yp[b:b + 1], p)
                p = jnp.where((r == 8 + ty) & y_hi_t, yp[b + 1:b + 2], p)
            return p

        def compute_source(r):
            gz = z0 + r + 1

            def Vs(P, k=0, j=0, i=0):
                p = _roll_x(row(P, r + k), i, interpret)
                return p[1 + j:ty + 15 + j]
            metrics = {
                'dzci_c': dzci_s[gz, 0],
                'dzci_m': dzci_s[gz - 1, 0],
                'dzfi_c': dzfi_s[gz, 0],
            }
            s0r, sij = st.strain_rate_core(Vs, metrics.__getitem__,
                                           su, sv, sw, dxi, dyi,
                                           with_sij=True)
            up0 = _roll_x(row(su, r), -1, interpret)
            uc = 0.5 * (row(su, r)[1:ty + 15] + up0[1:ty + 15])
            vp0 = row(sv, r)
            vc = 0.5 * (vp0[1:ty + 15] + vp0[0:ty + 14])
            wc = 0.5 * (row(sw, r)[1:ty + 15] + row(sw, r - 1)[1:ty + 15])
            planes = [s0r * sq for sq in sij]
            planes += [uc, vc, wc]
            planes += [uc * uc, vc * vc, wc * wc, uc * vc, uc * wc, vc * wc]
            return planes, s0r

        def yfix_src(zf):
            if not has_ye:
                return zf
            r = _riota(zf.shape)
            glo = 2.0 * zf[7:8] - zf[8:9] if ywalls[0] else zf[7:8]
            zf = jnp.where((r == 6) & y_lo_t, glo, zf)
            ghi = (2.0 * zf[ty + 6:ty + 7] - zf[ty + 5:ty + 6]
                   if ywalls[1] else zf[ty + 6:ty + 7])
            return jnp.where((r == ty + 7) & y_hi_t, ghi, zf)

        def filt_src(pm, pc, pp):
            zf = yfix_src(0.25 * (pm + 2.0 * pc + pp))
            q = 0.25 * (_roll_x(zf, -1, interpret) + 2.0 * zf
                        + _roll_x(zf, 1, interpret))
            q = 0.25 * (q[:-2] + 2.0 * q[1:-1] + q[2:])
            return q[6:6 + ty]

        def vel_row(P, lg, parallel, parallel_y=False):
            p = row(P, lg)
            if parallel and wall_lo:
                p = jnp.where(jnp.logical_and(k == 0, lg == -1),
                              2.0 * row(P, 0) - row(P, 1), p)
            if parallel and wall_hi:
                p = jnp.where(jnp.logical_and(k == klast, lg == tz),
                              2.0 * row(P, tz - 1) - row(P, tz - 2), p)
            if has_ye and parallel_y:
                r = _riota(p.shape)
                if ywalls[0]:
                    p = jnp.where((r == 7) & y_lo_t,
                                  2.0 * p[8:9] - p[9:10], p)
                if ywalls[1]:
                    p = jnp.where((r == 8 + ty) & y_hi_t,
                                  2.0 * p[7 + ty:8 + ty] - p[6 + ty:7 + ty],
                                  p)
            return p

        def filt_vel_ext(P, kk, parallel, parallel_y=False):
            """filter3d of the velocity window -> (ty+2, nx) at row kk:
            rows 0..ty+1 <-> global interior y = y0-1 .. y0+ty (one extra
            row per side for the test-level strain's y stencil)."""
            zf = 0.25 * (vel_row(P, kk - 1, parallel, parallel_y)
                         + 2.0 * vel_row(P, kk, parallel, parallel_y)
                         + vel_row(P, kk + 1, parallel, parallel_y))
            q = 0.25 * (_roll_x(zf, -1, interpret) + 2.0 * zf
                        + _roll_x(zf, 1, interpret))
            q = 0.25 * (q[:-2] + 2.0 * q[1:-1] + q[2:])   # width ty+14
            return q[6:8 + ty]

        def slot3(r):
            return jax.lax.rem(r + 3, 3)

        def body(t, carry):
            # stage A: source planes at r = t-1 (DS1's scheme verbatim)
            @pl.when(t < tz + 2)
            def _():
                r = t - 1
                r_c = jnp.clip(z0 + r, 0, nz - 1) - z0
                planes, s0r = compute_source(r_c)
                sl = jax.lax.rem(t, 3)
                for q in range(NWQ):
                    ring[sl, q] = planes[q]
                s0ring[sl] = s0r

            # stage B1: filtered velocity at r_v = t-2 (clipped at the
            # domain edges -- the edge rows are replaced by the in-register
            # BC recipes at stage C and never read otherwise)
            @pl.when(t >= 1)
            def _():
                rv = t - 2
                rv_c = jnp.clip(z0 + rv, 0, nz - 1) - z0
                sl = slot3(rv)
                fvr[sl, 0] = filt_vel_ext(su, rv_c, True, parallel_y=True)
                fvr[sl, 1] = filt_vel_ext(sv, rv_c, True, parallel_y=False)
                fvr[sl, 2] = filt_vel_ext(sw, rv_c, False, parallel_y=True)

            # stage B2: fm / lij at r_b = t-2 (DS1's emission, into VMEM)
            @pl.when(jnp.logical_and(t >= 2, t < tz + 2))
            def _():
                rb = t - 2
                sm, sc2, sp2 = (jax.lax.rem(t - 2, 3), jax.lax.rem(t - 1, 3),
                                jax.lax.rem(t, 3))
                is_lo = jnp.logical_and(k == 0, rb == 0)
                is_hi = jnp.logical_and(k == klast, rb == tz - 1)
                outs = []
                for q in range(NWQ):
                    pm = ring[sm, q]
                    pc = ring[sc2, q]
                    pp = ring[sp2, q]
                    glo = 2.0 * pc - pp if wall_lo else pc
                    ghi = 2.0 * pc - pm if wall_hi else pc
                    pm = jnp.where(is_lo, glo, pm)
                    pp = jnp.where(is_hi, ghi, pp)
                    outs.append(filt_src(pm, pc, pp))
                sl = slot3(rb)
                for q in range(6):
                    fqr[sl, q] = outs[q]
                fc = outs[6:9]
                cps = (fc[0] * fc[0], fc[1] * fc[1], fc[2] * fc[2],
                       fc[0] * fc[1], fc[0] * fc[2], fc[1] * fc[2])
                for q in range(6):
                    fqr[sl, 6 + q] = outs[9 + q] - cps[q]

            # stage C: test-level strain + contraction at kk = t-3
            @pl.when(t >= 3)
            def _():
                kk = t - 3
                kz = z0 + kk + 1
                is_lo = jnp.logical_and(k == 0, kk == 0)
                is_hi = jnp.logical_and(k == klast, kk == tz - 1)
                fcache = {}

                def fbase(ci, dk):
                    key = ('y', ci, dk)
                    if key in fcache:
                        return fcache[key]
                    p = fvr[slot3(kk + dk), ci]
                    if has_ye:
                        r = _riota(p.shape)
                        if ci == 1:
                            # v: y-face 'D' 0 -- wall face (padded y 0) and
                            # the padded-ny rewrite are both 0
                            if ywalls[0]:
                                p = jnp.where((r == 0) & y_lo_t, 0.0, p)
                            if ywalls[1]:
                                p = jnp.where((r == ty) & y_hi_t, 0.0, p)
                        else:
                            p = jnp.where((r == 0) & y_lo_t,
                                          sylo * p[1:2] + yoff_lo[ci], p)
                            p = jnp.where((r == ty + 1) & y_hi_t,
                                          syhi * p[ty:ty + 1]
                                          + yoff_hi[ci], p)
                    fcache[key] = p
                    return p

                def fzfix(ci, dk):
                    key = ('z', ci, dk)
                    if key in fcache:
                        return fcache[key]
                    p = fbase(ci, dk)
                    if ci == 2:
                        # w: 'D' 0 on both faces -- padded row 0 is the
                        # lower wall face, padded row nz the set_bc rewrite
                        if dk == -1:
                            p = jnp.where(is_lo, 0.0, p)
                        if dk == 0:
                            p = jnp.where(is_hi, 0.0, p)
                    else:
                        if dk == -1:
                            p = jnp.where(is_lo, szlo * fbase(ci, 0)
                                          + zoff_lo[ci], p)
                        if dk == 1:
                            p = jnp.where(is_hi, szhi * fbase(ci, 0)
                                          + zoff_hi[ci], p)
                    fcache[key] = p
                    return p

                def fplane(ci, dk, di):
                    key = ('r', ci, dk, di)
                    if key not in fcache:
                        fcache[key] = _roll_x(fzfix(ci, dk), di, interpret)
                    return fcache[key]

                def Vf(ci, k=0, j=0, i=0):
                    return fplane(ci, k, i)[1 + j:1 + j + ty]

                metrics = {
                    'dzci_c': dzci_s[kz, 0],
                    'dzci_m': dzci_s[kz - 1, 0],
                    'dzfi_c': dzfi_s[kz, 0],
                }
                s0f, sijf = st.strain_rate_core(Vf, metrics.__getitem__,
                                                0, 1, 2, dxi, dyi,
                                                with_sij=True)
                a2 = alph2_s[kz, 0]
                if has_ye and (ywalls[0] or ywalls[1]):
                    rt = jax.lax.broadcasted_iota(jnp.int32, (ty, nx), 0)
                    if ywalls[0]:
                        a2 = jnp.where((rt == 0) & y_lo_t, 2.52, a2)
                    if ywalls[1]:
                        a2 = jnp.where((rt == ty - 1) & y_hi_t, 2.52, a2)
                sl = slot3(kk)
                mij = [2.0 * (fqr[sl, q] - a2 * s0f * sijf[q])
                       for q in range(6)]
                lij = [fqr[sl, 6 + q] for q in range(6)]
                num = (mij[0] * lij[0] + mij[1] * lij[1] + mij[2] * lij[2]
                       + 2.0 * (mij[3] * lij[3] + mij[4] * lij[4]
                                + mij[5] * lij[5]))
                den = (mij[0] * mij[0] + mij[1] * mij[1] + mij[2] * mij[2]
                       + 2.0 * (mij[3] * mij[3] + mij[4] * mij[4]
                                + mij[5] * mij[5]))
                s0row = s0ring[jax.lax.rem(kk + 1, 3)][7:7 + ty]
                if x_interior is not None and avg != 'cavity':
                    # x-extended (gx-sharded) inputs: the averaging sums
                    # count interior lanes only (the 64-lane halo pads and
                    # their roll-wraparound garbage are excluded)
                    xlo, xn = x_interior
                    li = jax.lax.broadcasted_iota(jnp.int32, num.shape, 1)
                    xmask = (li >= xlo) & (li < xlo + xn)
                    num = jnp.where(xmask, num, 0.0)
                    den = jnp.where(xmask, den, 0.0)
                if avg == 'cavity':
                    visct_o[kk] = jnp.maximum(s0row * num / den, 0.0)
                elif avg == 'duct' and fold_ratio:
                    # single-chip / gy-slab duct: each (z, y) row holds
                    # its COMPLETE homogeneous-x extent locally, so the
                    # ave2d ratio finishes right here — no s0/partials
                    # round trip, no host multiply pass (ave2d_duct,
                    # sgs.f90:540-614)
                    nsum = jnp.sum(num, axis=-1, keepdims=True)
                    dsum = jnp.sum(den, axis=-1, keepdims=True)
                    visct_o[kk] = jnp.maximum(s0row * (nsum / dsum), 0.0)
                elif avg == 'duct':
                    s0_o[kk] = s0row
                    num_o[kk] = jnp.sum(num, axis=-1, keepdims=True)
                    den_o[kk] = jnp.sum(den, axis=-1, keepdims=True)
                else:
                    s0_o[kk] = s0row
                    num_o[kk] = jnp.broadcast_to(jnp.sum(num).reshape(1, 1),
                                                 (8, 128))
                    den_o[kk] = jnp.broadcast_to(jnp.sum(den).reshape(1, 1),
                                                 (8, 128))
            return carry

        jax.lax.fori_loop(0, tz + 3, body, 0)
    return kernel


def fused_dsmag_onepass(u, v, w, ue, ve, we, alph2_1d, dzci, dzfi, dxi, dyi,
                        wall_lo, wall_hi, avg, interpret=False, y_ext=False,
                        ye=None, yze=None, ywalls=None, ystrips=None,
                        ywf=None, x_interior=None,
                        zvals=(0.0, 0.0, 0.0, 0.0),
                        yvals=(0.0, 0.0, 0.0, 0.0), fold_ratio=False):
    """Single-pass dynamic Smagorinsky: reads the corrected-fill velocity
    interiors (+ z-edge stacks / y bundles), returns visct (avg='cavity',
    or avg='duct' with fold_ratio=True — every (z, y) row's homogeneous-x
    extent is locally complete, so the ave2d ratio finishes in stage C)
    or (s0, num_part, den_part) with the partial-sum shapes of
    fused_dsmag_level2 -- the caller finishes the homogeneous averaging
    and forms visct = max(s0 * ratio, 0).  No DS1->DS2 intermediates touch
    HBM (the two-pass pipeline streams ~25 words/cell; this reads 3 and
    writes 1).  Returns None if the shape doesn't fit `fused_tiles`.

    x_interior=(lo, n): inputs are x-halo-EXTENDED (gx-sharded meshes,
    64 lanes/side so the filter chain's 3-deep x dependencies resolve
    locally; in-kernel rolls wrap around the pad harmlessly) and the
    averaging sums count lanes [lo, lo+n) only; outputs keep the extended
    width (the caller slices the interior)."""
    nz, ny, nx = u.shape
    if y_ext:
        ny -= 16
    dt = u.dtype
    if nx % 128 or ny % 8:
        return None
    tiles = fused_tiles(nz, ny, dt.itemsize, nx)
    if tiles is None:
        return None
    tz, ty = tiles
    if nz % tz or nz < tz:
        return None
    alph2_s = jnp.zeros((nz + 2, 1), dt).at[1:nz + 1, 0].set(
        jnp.asarray(alph2_1d, dt))
    dzci_s = jnp.asarray(dzci, dt).reshape(-1, 1)
    dzfi_s = jnp.asarray(dzfi, dt).reshape(-1, 1)
    has_ye = ye is not None
    has_ystrips = ystrips is not None
    has_ywf = ywf is not None
    yargs = (ye, yze) if has_ye else ()
    sargs = tuple(ystrips) if has_ystrips else ()
    wargs = ((jnp.stack([jnp.asarray(ywf[0], dt),
                         jnp.asarray(ywf[1], dt)]).reshape(1, 2),)
             if has_ywf else ())
    grid = (nz // tz, ny // ty)
    int_spec = pl.BlockSpec((tz, ty, nx), lambda k, j: (k, j, 0))
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    fold_ratio = bool(fold_ratio) and avg == 'duct'
    assert not (fold_ratio and x_interior is not None), \
        'fold_ratio: the x extent must be locally complete (gx == 1)'
    kern = _ds_onepass_kernel(tz, ty, nz, ny, nx, float(dxi), float(dyi),
                              bool(wall_lo), bool(wall_hi), avg, interpret,
                              y_ext=y_ext, ywalls=ywalls if has_ye else None,
                              has_ystrips=has_ystrips, has_ywf=has_ywf,
                              x_interior=x_interior,
                              zvals=tuple(float(q) for q in zvals),
                              yvals=tuple(float(q) for q in yvals),
                              fold_ratio=fold_ratio)
    if avg == 'cavity' or fold_ratio:
        out_specs = [int_spec]
        out_shape = [jax.ShapeDtypeStruct((nz, ny, nx), dt)]
    elif avg == 'duct':
        out_specs = [int_spec] + [pl.BlockSpec((tz, ty, 1),
                                               lambda k, j: (k, j, 0))] * 2
        out_shape = [jax.ShapeDtypeStruct((nz, ny, nx), dt)] \
            + [jax.ShapeDtypeStruct((nz, ny, 1), dt)] * 2
    else:
        gy = ny // ty
        out_specs = [int_spec] + [pl.BlockSpec((tz, 8, 128),
                                               lambda k, j: (k, j, 0))] * 2
        out_shape = [jax.ShapeDtypeStruct((nz, ny, nx), dt)] \
            + [jax.ShapeDtypeStruct((nz, gy * 8, 128), dt)] * 2
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[smem_spec] * 3
                 + [any_spec] * (6 + 2 * has_ye + 2 * has_ystrips)
                 + [smem_spec] * has_ywf,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((2, tz + 4, ty + 16, nx), dt)
                        for _ in range(3)]
                       + ([pltpu.VMEM((2, tz + 4, 16, nx), dt)]
                          if has_ye else [])
                       + [pltpu.VMEM((3, NWQ, ty + 14, nx), dt),
                          pltpu.VMEM((3, ty + 14, nx), dt),
                          pltpu.VMEM((3, 3, ty + 2, nx), dt),
                          pltpu.VMEM((3, 12, ty, nx), dt),
                          pltpu.SemaphoreType.DMA((2, 3 + has_ye, 9))],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(alph2_s, dzci_s, dzfi_s, u, v, w, ue, ve, we, *yargs, *sargs, *wargs)
    if avg == 'cavity' or fold_ratio:
        return outs[0]
    return outs[0], outs[1], outs[2]
