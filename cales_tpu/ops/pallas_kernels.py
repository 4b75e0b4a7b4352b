"""Pallas TPU mega-kernels for the hot stencil path.

Motivation (measured, round 2): XLA's TPU loop-fusion emitter streams every
distinct shifted-slice operand of a stencil expression from HBM separately —
the fused momentum region costs ~68 field passes/substep and the strain-rate
region ~30, versus ~14 and ~4 structurally necessary.  These kernels load
each field into VMEM once per tile and take all stencil shifts from VMEM.

Design (validated by on-device probes, see git history):
  * Mosaic DMA slices must have offsets AND sizes aligned to the (8, 128)
    f32 tile in the last two dims; leading-dim slices are unconstrained.
  * Kernel inputs are **interior (nz, ny, nx) arrays plus (3, ny, nx)
    z-edge stacks** (ops/boundary.zedge_*): rows [padded row 0, padded row
    nz (the wall-face rewrite slot of set_bc for the staggered component,
    bound.f90:292-293/365-366), padded row nz+1].  The z halo window is
    assembled in-kernel from the two sources, so NO full-field padded copy
    is ever materialized (a zpad concat costs 2 HBM passes per field).
  * x and y ghosts are closed in-kernel: periodic y by three aligned wrap
    DMAs assembling a (TZ+2, TY+16, nx) halo window — Mosaic requires
    8/128-aligned DMA offsets AND sizes in the last two dims; walled y
    (duct/cavity classes) via 16-row ye ghost-row bundles with in-register
    wall-tile fixes; periodic x by `pltpu.roll` on VMEM planes; walled x
    (inflow/outflow) via xe ghost-column bundles + edge-lane roll fixups.
    Any BC letter is supported in z via the edge stacks.
  * The kernel body is a `fori_loop` over the TZ output z-planes with all
    math on 2D (TY, nx) planes — this keeps the Mosaic vector IR small (the
    round-1 fully-3D body took >20 min to compile; this design compiles in
    ~0.5-2 min) — and shares the EXACT discretization with the XLA path via
    `stencil.momentum_rhs_core` / `strain_rate_core` (accessor interface).

Kernels:
  * fused_mom_rk         — momentum RHS (mom.f90:17-309) + RK3 update with
    pressure gradient and body force (rk.f90:77-94) in one pass.
  * fused_smag           — strain rate (sgs.f90:1019-1110) + van Driest
    static Smagorinsky (sgs.f90:69-152) in one pass.
  * fused_fillps         — projection RHS div(u)/dt (fillps.f90:14-48).
  * fused_correc_updatep — velocity correction (correc.f90:14-68) +
    pressure update (updatep.f90:14-24, explicit-diffusion branch) in one
    pass.

Implicit diffusion (impdiff/impdiff_1d) runs in-kernel too since round 3:
the momentum kernel emits the explicit/implicit RHS split (and, with the CN
fold, u_RK - 0.5*f12*rd directly); the CN Helmholtz solves ride
ops/pallas_solve.py.  Remaining XLA fallbacks are listed by
`Simulation.exec_path()` (timeloop dispatches; see PARITY.md).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import stencil as st

# per-kernel scoped-VMEM budget: v5e has 128 MiB of VMEM; the Mosaic default
# scoped limit is 16 MiB, raised via CompilerParams(vmem_limit_bytes=...)
VMEM_BUDGET = 100 * 1024 * 1024
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=VMEM_BUDGET)


def _no_alias_io():
    """Kill-switch for the in-place (input_output_aliases) kernel streams —
    A/B measurement and debugging."""
    import os
    return os.environ.get('CALES_NO_ALIAS_IO', '') == '1'


def _roll_xp(p):
    """value at i+1 (periodic x): roll lanes left by 1."""
    return pltpu.roll(p, p.shape[-1] - 1, len(p.shape) - 1)


def _roll_xm(p):
    """value at i-1 (periodic x)."""
    return pltpu.roll(p, 1, len(p.shape) - 1)


def _np_roll_variant(p, i):
    if i == 0:
        return p
    return jnp.roll(p, -i, axis=-1)


def _zwin_copies(fint, zedge, scr, sem, z0, y0, ny, tz, ty, case,
                 y_ext=False, mode='tile'):
    """Async copies assembling the (tz+2, ty+16, nx) halo window for one
    field from its interior array + z-edge stack.

    Window row m holds padded z row z0+m.  Padded rows 1..nz-1 come from the
    interior (padded r = interior r-1); padded rows 0, nz, nz+1 come from
    the edge stack (rows 0, 1, 2).  `case` selects the z-tile position:
    'lo' (k==0), 'mid', 'hi' (k==klast), 'single' (one z tile).
    Every z block is split into three aligned y DMAs: 8 wrap rows below,
    ty interior rows, 8 wrap rows above (periodic y) — or, with y_ext=True
    (the shard_map path), ONE contiguous DMA from arrays that already carry
    8 exchanged halo rows on each y side (row y of the ext array = local
    interior row y-8).

    mode='ally': the source is a small bundle whose full y extent equals
    the scratch's (e.g. the 16-row y-edge bundle): one whole-extent DMA per
    z block, no tiling/wrap in y.

    mode=('strips', yh, yhz, base, ycase): SHARDED y halos from packed
    ppermute'd strip arrays instead of materialized (ny+16)-extended copies
    (which cost ~2 extra HBM passes per array per kernel invocation): when
    this tile touches a shard edge (`ycase` in 'lo'/'hi'/'both', selected
    by the caller's pl.when ladder) the corresponding 8-row block comes
    from `yh` (nz, 16*nf, nx) / `yhz` (3, 16*nf, nx) at static row `base`
    (+8 for the hi side); interior blocks read the local neighbor rows."""
    strips = isinstance(mode, tuple)
    if strips:
        _, yh, yhz, base, ycase = mode

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
                    hsrc.at[pl.ds(sz, rows), base:base + 8],
                    scr.at[pl.ds(dr, rows), 0:8], sem.at[b])
            else:
                lo_c = pltpu.make_async_copy(
                    src.at[pl.ds(sz, rows), pl.ds(ylo, 8)],
                    scr.at[pl.ds(dr, rows), 0:8], sem.at[b])
            if ycase in ('hi', 'both'):
                hi_c = pltpu.make_async_copy(
                    hsrc.at[pl.ds(sz, rows), base + 8:base + 16],
                    scr.at[pl.ds(dr, rows), 8 + ty:16 + ty], sem.at[b + 2])
            else:
                hi_c = pltpu.make_async_copy(
                    src.at[pl.ds(sz, rows), pl.ds(yhi, 8)],
                    scr.at[pl.ds(dr, rows), 8 + ty:16 + ty], sem.at[b + 2])
            return [
                lo_c,
                pltpu.make_async_copy(src.at[pl.ds(sz, rows), pl.ds(y0a, ty)],
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

    tzc = scr.shape[0] - 2  # rows of interior-z coverage in this window
    if case == 'single':
        cs = ycop(zedge, 0, 1, 0, 0) + ycop(zedge, 1, 2, tzc, 3)
        if tzc > 1:
            cs += ycop(fint, 0, tzc - 1, 1, 6)
        return cs
    if case == 'lo':
        return ycop(zedge, 0, 1, 0, 0) + ycop(fint, 0, tzc + 1, 1, 3)
    if case == 'hi':
        return ycop(fint, z0 - 1, tzc, 0, 0) + ycop(zedge, 1, 2, tzc, 3)
    return ycop(fint, z0 - 1, tzc + 2, 0, 0)


def _assemble_windows(fields, k, z0, y0, ny, nz, tz, ty, action,
                      y_ext=False):
    """Start or wait the window DMAs of every (fint, zedge, scr, sem[,
    mode]) entry, branching once on the z-tile position (and, for strips
    entries, on the y-tile position).  `action` is 'start' or 'wait'; both
    calls must use identical structure so every started copy is waited
    exactly once."""
    klast = nz // tz - 1
    gj = ny // ty
    has_strips = any(len(e) > 4 and isinstance(e[4], tuple) for e in fields)

    def run(case, ycase=None):
        for entry in fields:
            fint, zedge, scr, sem = entry[:4]
            mode = entry[4] if len(entry) > 4 else 'tile'
            if isinstance(mode, tuple):
                mode = mode + (ycase,)
            for c in _zwin_copies(fint, zedge, scr, sem, z0, y0, ny, tz, ty,
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


class _PlaneAccessor:
    """V/M accessor over VMEM halo windows for one output z-plane.

    Window layout: rows [0:8) wrap-lo, [8:8+ty) interior tile, [8+ty:+8)
    wrap-hi; the interior tile's row r corresponds to window row 8+r.
    x shifts are periodic rolls, cached per (field, dk, di).

    xe/xlane: x-ghost-column bundle window for x-SHARDED runs (the
    updthalo-in-x analogue, bound.f90:619-723): after a periodic roll the
    edge lane holds the local wrap, which is wrong at a shard boundary —
    it is replaced by the neighbor's ghost column carried in the packed
    `xe` window (field m: lane 2m = value at local padded x=0, lane 2m+1 =
    padded nx+1).  The xe window has the same (z, y-halo) structure as the
    field windows, so shifted reads pick corner-consistent values.
    """

    def __init__(self, windows, kk, ty, interpret=False, xe=None, xlane=None,
                 ye=None, ylane=None, ystag=None, y_lo=None, y_hi=None,
                 xe_ybase=None):
        self.win = windows            # dict: field key -> scratch ref
        self.kk = kk
        self.ty = ty
        self.interpret = interpret
        self.xe = xe
        self.xlane = xlane or {}
        # x+y-walled: the xe window's y-wall ghost rows (7 / 8+ty / 7+ty)
        # contain wrap garbage at wall tiles — replaced from the ye
        # bundle's xe corner section (rows xe_ybase+0/1/2, lanes [:128]);
        # the row-2 replacement is safe for ALL lanes (centered fields'
        # section row 2 is their interior last row, a no-op)
        self.xe_ybase = xe_ybase
        # y-wall ghost-row fix (see _fix_y): ye = 16-row bundle window;
        # ylane: fid -> row base (rows base+0/1/2 = lo ghost, hi ghost,
        # padded-ny rewrite); ystag: fids whose padded-ny row is rewritten
        # (the y-staggered component under a prediction fill); y_lo / y_hi:
        # traced booleans — this tile touches the lower / upper y wall
        self.ye = ye
        self.ylane = ylane or {}
        self.ystag = ystag or set()
        self.y_lo = y_lo
        self.y_hi = y_hi
        self._cache = {}
        self._iota = None
        self._riota = None

    def _fix_roll(self, p, fid, dk, di):
        if self.xe is None or fid not in self.xlane:
            return p
        m = self.xlane[fid]
        xkey = ('xe', dk)
        if xkey not in self._cache:
            xp_ = self.xe[self.kk + 1 + dk]
            if self.xe_ybase is not None and self.ye is not None:
                ykey = ('ye', dk)
                if ykey not in self._cache:
                    self._cache[ykey] = self.ye[self.kk + 1 + dk]
                ysec = self._cache[ykey][:, :xp_.shape[-1]]
                b = self.xe_ybase
                r = jax.lax.broadcasted_iota(jnp.int32, xp_.shape, 0)
                if self.y_lo is not None:
                    xp_ = jnp.where((r == 7) & self.y_lo, ysec[b:b + 1], xp_)
                if self.y_hi is not None:
                    xp_ = jnp.where((r == 8 + self.ty) & self.y_hi,
                                    ysec[b + 1:b + 2], xp_)
                    xp_ = jnp.where((r == 7 + self.ty) & self.y_hi,
                                    ysec[b + 2:b + 3], xp_)
            self._cache[xkey] = xp_
        xp = self._cache[xkey]
        nx = p.shape[-1]
        if self._iota is None:
            self._iota = jax.lax.broadcasted_iota(jnp.int32, p.shape,
                                                  len(p.shape) - 1)
        if di == 1:
            return jnp.where(self._iota == nx - 1, xp[:, 2 * m + 1:2 * m + 2],
                             p)
        return jnp.where(self._iota == 0, xp[:, 2 * m:2 * m + 1], p)

    def _fix_y(self, p, fid, dk):
        """Replace the y-ghost rows of a wall-adjacent tile's window plane:
        the wrap DMAs put periodic-wrap data there, which is wrong at a y
        wall — rows 7 (padded y 0), 8+ty (padded ny+1) and, for the
        y-staggered rewrite, 7+ty (padded ny) come from the ye bundle
        (ops/boundary.yedge_*).  Only the +-1 rows a 3-point stencil reads
        are fixed; deeper halo rows stay wrap garbage and are never read."""
        if self.ye is None or fid not in self.ylane:
            return p
        base = self.ylane[fid]
        ykey = ('ye', dk)
        if ykey not in self._cache:
            self._cache[ykey] = self.ye[self.kk + 1 + dk]
        yp = self._cache[ykey]
        if self._riota is None:
            self._riota = jax.lax.broadcasted_iota(jnp.int32, p.shape, 0)
        r = self._riota
        if self.y_lo is not None:
            p = jnp.where((r == 7) & self.y_lo, yp[base:base + 1], p)
        if self.y_hi is not None:
            p = jnp.where((r == 8 + self.ty) & self.y_hi,
                          yp[base + 1:base + 2], p)
            if fid in self.ystag:
                p = jnp.where((r == 7 + self.ty) & self.y_hi,
                              yp[base + 2:base + 3], p)
        return p

    def plane(self, f, dk, di):
        key = (id(f), dk, di)
        if key not in self._cache:
            base_key = (id(f), dk, 0)
            if base_key not in self._cache:
                self._cache[base_key] = self._fix_y(
                    self.win[id(f)][self.kk + 1 + dk], id(f), dk)
            p = self._cache[base_key]
            if di == 1:
                p = (_np_roll_variant(p, 1) if self.interpret else _roll_xp(p))
                p = self._fix_roll(p, id(f), dk, 1)
            elif di == -1:
                p = (_np_roll_variant(p, -1) if self.interpret else _roll_xm(p))
                p = self._fix_roll(p, id(f), dk, -1)
            self._cache[key] = p
        return self._cache[key]

    def V(self, f, k=0, j=0, i=0):
        return self.plane(f, k, i)[8 + j:8 + j + self.ty]


def pick_tiles(nz, ny, itemsize, nx, nwin=5, nio=9):
    """(TZ, TY) fitting `nwin` halo windows + `nio` pipelined tile buffers
    in the VMEM budget.  Larger TY amortizes the 16 aligned y-wrap halo
    rows (overread factor (ty+16)/ty), so prefer the largest that fits."""
    if ny < 8 or ny % 8:
        return None
    for tz, ty in ((8, 128), (8, 64), (8, 32), (8, 16), (4, 16), (4, 8),
                   (2, 8)):
        if nz % tz or ny % ty:
            continue
        win = (tz + 2) * (ty + 16) * nx * itemsize
        outs = tz * ty * nx * itemsize
        tot = nwin * win + 2 * nio * outs   # windows + 2-slot in/out pipeline
        if tot < VMEM_BUDGET - 8 * 1024 * 1024:
            return tz, ty
    return None


def _dot_xop(a, b, dims=(((1,), (0,)), ((), ()))):
    """In-kernel operator matmul at bf16x3 (f32) / full precision (f64).

    Mosaic rejects jax.lax.Precision.HIGH on dots, so the 3-pass bf16
    split is done by hand: a@b ~= ah@bh + ah@bl + al@bh with x = hi + lo,
    hi = bf16(x) — the same error class as the solve's HIGH tensordots
    (ops/transforms._matmul_axis)."""
    if a.dtype != jnp.float32:
        return jax.lax.dot_general(a, b, dims,
                                   precision=jax.lax.Precision.HIGHEST)

    def d(x, y):
        return jax.lax.dot_general(x, y, dims,
                                   preferred_element_type=jnp.float32)
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    return d(ah, bh) + d(ah, bl) + d(al, bh)


def mom_tiles(nz, ny, itemsize, nx, split=None, fuse_fillps=False,
              has_scal=False, fold_cn=False):
    """Tile pick with fused_mom_rk's exact VMEM budget (the largest of the
    kernel path) — the constructor gate MUST use this same function so a
    shape that passes the gate can never fail inside the wrapper.  split:
    the implicit-diffusion mode (None / '1d' / 'xy+z'), which adds three
    diffusive-RHS outputs unless fold_cn elides them; fuse_fillps adds the
    projection-RHS output; has_scal adds the passive-scalar window + its 3
    in/out streams."""
    return pick_tiles(nz, ny, itemsize, nx, nwin=10 + 2 * has_scal,
                      nio=(9 if split is None or fold_cn else 12)
                      + 2 * fuse_fillps + 3 * has_scal)


def _pipelined_windows(specs, sems, nz, ny, tz, ty, k, j, interpret,
                       y_ext=False):
    """Double-buffered window prefetch over the sequential TPU grid.

    specs: [(fint, zedge, scr2)] with scr2 leading dim 2 (slots); sems:
    (2, nf, 9) DMA semaphores.  Waits the current tile's window DMAs
    (started by the previous tile) and starts the next tile's into the
    other slot, overlapping input DMA with compute.  Returns the per-field
    window ref views of the current tile.  Interpret mode (and grids the
    interpreter runs without persistent scratch) uses the non-pipelined
    start+wait path in slot 0."""
    gj = ny // ty
    T = (nz // tz) * gj
    t = k * gj + j

    def assemble(tt, sl, action):
        gj_t = jnp.asarray(gj, jnp.int32)
        k2 = jax.lax.div(jnp.asarray(tt, jnp.int32), gj_t)
        j2 = jax.lax.rem(jnp.asarray(tt, jnp.int32), gj_t)
        fields = [(s[0], s[1], s[2].at[sl], sems.at[sl, m]) + tuple(s[3:])
                  for m, s in enumerate(specs)]
        _assemble_windows(fields, k2, k2 * tz, j2 * ty, ny, nz, tz, ty,
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


def _mom_kernel(tz, ty, nz, ny, nx, visc, dxi, dyi, bforce, interpret,
                y_ext=False, split=None, has_xe=False,
                ywalls=(False, False), fuse_fillps=False, wrec=None,
                sum_flags=(False, False), has_xop=False, has_ystrips=False,
                has_ruo=True, has_sgs=True, has_scal=False, alpha_s=0.0,
                ssource=0.0, has_ywf=False, fold_cn=False, xye=False,
                has_xstrips=False):
    """fuse_fillps: also emit the projection RHS div(u_new)/dt_rk in the
    same pass (fillps.f90 folded into the momentum tail): the RHS core is
    evaluated one y row wide (row 7, the j-1 neighbor of tile row 0 — the
    v RK update there needs the rvo halo strip), the w(k-1) face flows
    through a fori carry + a per-y-tile stash across z tiles, and the
    prediction fill's z faces are synthesized from `wrec` (w's z-ghost
    recipe; periodic z is gated out).  The deferred-forcing contract:
    bulk forcing along PERIODIC directions adds a constant, which cancels
    in the divergence, so the caller measures the bulk means from the
    `sum_flags` partial-sum outputs and folds the forcing constants into
    the projection kernel instead (rk.f90:197-222 reordered, exactly)."""
    has_ye = any(ywalls)
    gj = ny // ty
    klast = nz // tz - 1

    def kernel(sc, dzci_s, dzfi_s, *rest):
        rest = list(rest)
        # has_sgs=False (sgstype 'none'): the eddy-viscosity field is
        # identically zero — its HBM stream, VMEM window and all eddy
        # stress-tensor terms are elided (momentum_rhs_core with_sgs)
        if has_sgs:
            u, v, w, s, p, ue, ve, we, se, pe = rest[0:10]
            del rest[0:10]
        else:
            u, v, w, p, ue, ve, we, pe = rest[0:8]
            s = se = None
            del rest[0:8]
        sca = scae = None
        if has_scal:
            # passive-scalar window field + z-edge stack (scal.f90 fused
            # into the momentum pass: the u/v/w windows are already here)
            sca, scae = rest[0:2]
            del rest[0:2]
        xe = xze = ye = yze = yh = yhz = xh = xhz = None
        if has_xe:
            xe, xze = rest[0], rest[1]
            del rest[0:2]
        if has_ye:
            ye, yze = rest[0], rest[1]
            del rest[0:2]
        if has_ystrips:
            yh, yhz = rest[0], rest[1]
            del rest[0:2]
        if has_xstrips:
            # x-WALLED sharded runs: the host-built xe bundle rides the
            # strips window mode with its OWN 16-row pack (the field pack
            # is nx lanes wide, the bundle 128 — they can't share)
            xh, xhz = rest[0], rest[1]
            del rest[0:2]
        ruo = rvo = rwo = rso = None
        if has_ruo:
            # first RK substep: f2 == 0 exactly (RK_COEFF[0][1]) so the
            # previous-RHS reads (3 full-field HBM streams) are skipped
            ruo, rvo, rwo = rest[0:3]
            del rest[0:3]
            if has_scal:
                rso = rest.pop(0)
        rvo_any = xop = None
        if fuse_fillps and has_ruo:
            rvo_any = rest.pop(0)
        if has_xop:
            xop = rest.pop(0)
        if split is None or fold_cn:
            u_o, v_o, w_o, ru_o, rv_o, rw_o = rest[0:6]
            rud_o = rvd_o = rwd_o = None
            del rest[0:6]
        else:
            (u_o, v_o, w_o, ru_o, rv_o, rw_o,
             rud_o, rvd_o, rwd_o) = rest[0:9]
            del rest[0:9]
        s_o = rs_o = None
        if has_scal:
            s_o, rs_o = rest[0:2]
            del rest[0:2]
        rhs_o = usum_o = vsum_o = None
        if fuse_fillps:
            rhs_o = rest.pop(0)
        if sum_flags[0]:
            usum_o = rest.pop(0)
        if sum_flags[1]:
            vsum_o = rest.pop(0)
        nf = 4 + has_sgs + has_scal
        if has_sgs:
            su2, sv2, sw2, ss2, sp2 = rest[0:5]
        else:
            su2, sv2, sw2, sp2 = rest[0:4]
            ss2 = None
        ssc2 = rest[4 + has_sgs] if has_scal else None
        del rest[0:nf]
        sxe2 = sye2 = None
        if has_xe:
            sxe2 = rest.pop(0)
        if has_ye:
            sye2 = rest.pop(0)
        strip = wstash = ssem = None
        if fuse_fillps:
            strip = rest.pop(0)
            wstash = rest.pop(0)
            ssem = rest.pop(0)
        sems = rest[-1]
        k = pl.program_id(0)
        j = pl.program_id(1)
        z0 = k * tz
        base = [(u, ue, su2), (v, ve, sv2), (w, we, sw2)]
        if has_sgs:
            base.append((s, se, ss2))
        base.append((p, pe, sp2))
        if has_scal:
            base.append((sca, scae, ssc2))
        if has_ystrips:
            specs = [e + (('strips', yh, yhz, 16 * m),)
                     for m, e in enumerate(base)]
        else:
            specs = list(base)
        if has_xe:
            xsp = (xe, xze, sxe2)
            if has_xstrips:
                xsp = xsp + (('strips', xh, xhz, 0),)
            specs.append(xsp)
        if has_ye:
            specs.append((ye, yze, sye2, 'ally'))
        wins = _pipelined_windows(specs, sems, nz, ny, tz, ty, k, j,
                                  interpret, y_ext=y_ext)
        su, sv, sw = wins[0:3]
        ss = wins[3] if has_sgs else None
        sp_ = wins[3 + has_sgs]
        ssc = wins[4 + has_sgs] if has_scal else None
        sxe = wins[nf] if has_xe else None
        sye = wins[nf + has_xe] if has_ye else None
        # per-shard wall flags (sharded y-walled runs: the SAME program runs
        # on every shard, so the wall fixes must be gated on whether THIS
        # shard owns the wall — sc rows 2/3 carry the traced flags)
        y_lo = (j == 0) if ywalls[0] else None
        y_hi = (j == gj - 1) if ywalls[1] else None
        if has_ywf:
            y_lo = (y_lo & (sc[0, 2] > 0.5)) if ywalls[0] else None
            y_hi = (y_hi & (sc[0, 3] > 0.5)) if ywalls[1] else None
        if fuse_fillps and has_ruo:
            # rvo halo strip (the j-1 row's previous-RHS, y-wrap aligned)
            ylo = pl.multiple_of((j * ty - 8) % ny, 8)
            cp = pltpu.make_async_copy(
                rvo_any.at[pl.ds(z0, tz), pl.ds(ylo, 8)], strip, ssem)
            cp.start()
            cp.wait()

        f1 = sc[0, 0]
        f2 = sc[0, 1]
        f12 = f1 + f2

        def body(kk, w_prev):
            kz = z0 + kk + 1          # padded z index (Fortran k)
            fwins = ([su, sv, sw] + ([ss] if has_sgs else []) + [sp_]
                     + ([ssc] if has_scal else []))
            acc = _PlaneAccessor(
                {id(f): f for f in fwins},
                kk, ty, interpret=interpret, xe=sxe,
                xlane={id(f): m for m, f in enumerate(fwins)},
                ye=sye, ylane={id(f): 3 * m for m, f in enumerate(fwins)},
                ystag={id(sv)}, y_lo=y_lo, y_hi=y_hi,
                xe_ybase=3 * len(fwins) if xye else None)
            metrics = {
                'dzci_c': dzci_s[kz, 0],
                'dzci_m': dzci_s[kz - 1, 0],
                'dzfi_c': dzfi_s[kz, 0],
                'dzfi_p': dzfi_s[kz + 1, 0],
            }
            V = acc.V
            (eu, exyu, ezu), (ev, exyv, ezv), (ew, exyw, ezw) = \
                st.momentum_rhs_core(V, metrics.__getitem__,
                                     su, sv, sw, ss, visc, dxi, dyi,
                                     with_sgs=has_sgs)
            # explicit/implicit split (mom.f90:277-303 runtime analogue)
            if split is None:
                ru, rv, rw = eu + exyu + ezu, ev + exyv + ezv, ew + exyw + ezw
                rud = rvd = rwd = None
            elif split == '1d':
                ru, rv, rw = eu + exyu, ev + exyv, ew + exyw
                rud, rvd, rwd = ezu, ezv, ezw
            else:
                ru, rv, rw = eu, ev, ew
                rud, rvd, rwd = exyu + ezu, exyv + ezv, exyw + ezw
            pc = V(sp_)
            gpx = dxi * (V(sp_, i=1) - pc)
            gpy = dyi * (V(sp_, j=1) - pc)
            gpz = metrics['dzci_c'] * (V(sp_, k=1) - pc)
            un = V(su) + f1 * ru + f12 * (bforce[0] - gpx)
            vn = V(sv) + f1 * rv + f12 * (bforce[1] - gpy)
            wn = V(sw) + f1 * rw + f12 * (bforce[2] - gpz)
            if has_ruo:
                un = un + f2 * ruo[kk]
                vn = vn + f2 * rvo[kk]
                wn = wn + f2 * rwo[kk]
            if has_scal:
                ds = st.scalar_rhs_core(V, metrics.__getitem__,
                                        su, sv, sw, ssc, alpha_s, dxi, dyi)
                sn = V(ssc) + f1 * ds + f12 * ssource
                if has_ruo:
                    sn = sn + f2 * rso[kk]
                s_o[kk] = sn
                rs_o[kk] = ds
            if not fuse_fillps:
                usum_v, vsum_v = un, vn
                if split is not None:
                    if fold_cn:
                        # emit the CN-solve RHS directly: u_RK(full diff)
                        # - 0.5*f12*rd in one shot (rk.f90:90-94 +
                        # main.f90:423-431 collapsed) — the three rd output
                        # streams and the caller's subtraction pass are
                        # elided.  Bulk-forcing sums still measure the FULL
                        # prediction (reference rk.f90:197-222 ordering).
                        h = 0.5 * f12
                        usum_v = un + f12 * rud
                        vsum_v = vn + f12 * rvd
                        un = un + h * rud
                        vn = vn + h * rvd
                        wn = wn + h * rwd
                    else:
                        # the full diffusive term enters the RK update; the
                        # caller subtracts 0.5*f12*rd before the CN
                        # Helmholtz solves
                        un = un + f12 * rud
                        vn = vn + f12 * rvd
                        wn = wn + f12 * rwd
                        rud_o[kk] = rud
                        rvd_o[kk] = rvd
                        rwd_o[kk] = rwd
                        usum_v, vsum_v = un, vn
                u_o[kk] = un
                v_o[kk] = vn
                w_o[kk] = wn
                ru_o[kk] = ru
                rv_o[kk] = rv
                rw_o[kk] = rw
                if sum_flags[0]:
                    usum_o[kk] = jnp.broadcast_to(
                        jnp.sum(usum_v).reshape(1, 1), (8, 128))
                if sum_flags[1]:
                    vsum_o[kk] = jnp.broadcast_to(
                        jnp.sum(vsum_v).reshape(1, 1), (8, 128))
                return 0

            # --- fused fillps tail (explicit path only) ---
            u_o[kk] = un
            v_o[kk] = vn
            w_o[kk] = wn
            ru_o[kk] = ru
            rv_o[kk] = rv
            rw_o[kk] = rw
            # v at tile row -1 (the j-1 neighbor of output row 0): a
            # single-row v-only RHS eval + RK update with the rvo halo
            # strip's last row (~2% extra work at ty=128, keeps the main
            # eval 8-row aligned)

            def V7(f, k=0, j=0, i=0):
                return acc.plane(f, k, i)[7 + j:8 + j]

            _, (ev7, exyv7, ezv7), _ = st.momentum_rhs_core(
                V7, metrics.__getitem__, su, sv, sw, ss, visc, dxi, dyi,
                components=('v',), with_sgs=has_sgs)
            gpy7 = dyi * (V7(sp_, j=1) - V7(sp_))
            v_prev = (V7(sv) + f1 * (ev7 + exyv7 + ezv7)
                      + f12 * (bforce[1] - gpy7))
            if has_ruo:
                v_prev = v_prev + f2 * strip[kk, 7:8]

            # prediction-fill z faces (set_bc on the new field; wrec =
            # (lt_lo, b_lo, dr_lo, lt_hi, b_hi, dr_hi) for w's z faces)
            lt_lo, b_lo, dr_lo, lt_hi, b_hi, dr_hi = wrec
            w_km = w_prev
            at_lo = jnp.logical_and(k == 0, kk == 0)
            glo = (jnp.full_like(wn, b_lo) if lt_lo == 'D'
                   else -dr_lo * b_lo + wn)
            w_km = jnp.where(at_lo, glo, w_km)
            at_hi = jnp.logical_and(k == klast, kk == tz - 1)
            ghi = (jnp.full_like(wn, b_hi) if lt_hi == 'D'
                   else dr_hi * b_hi + w_prev)
            w_cur = jnp.where(at_hi, ghi, wn)

            dti = 1.0 / f12
            vn_w = jnp.concatenate([v_prev, vn], axis=0)   # (ty+1, nx)
            un_m = (_np_roll_variant(un, -1) if interpret else _roll_xm(un))
            rhs = ((w_cur - w_km) * dti * dzfi_s[kz, 0]
                   + (vn_w[1:] - vn_w[:-1]) * (dti * dyi)
                   + (un - un_m) * (dti * dxi))
            if has_xop:
                # forward x transform on the otherwise-idle MXU (the
                # solve's first stage, tr.fwd 'mat'): rhs_hat = rhs @ OxT
                rhs = _dot_xop(rhs, xop[:, :])
            rhs_o[kk] = rhs
            if sum_flags[0]:
                usum_o[kk] = jnp.broadcast_to(jnp.sum(un).reshape(1, 1),
                                              (8, 128))
            if sum_flags[1]:
                vsum_o[kk] = jnp.broadcast_to(jnp.sum(vn).reshape(1, 1),
                                              (8, 128))
            @pl.when(kk == tz - 1)
            def _():
                wstash[j] = wn
            return wn

        # fused carry: w face of the previous z plane; seeded from the
        # per-y-tile stash written by the previous z tile (sequential grid)
        init = wstash[j] if fuse_fillps else 0
        jax.lax.fori_loop(0, tz, body, init)
    return kernel


def _grid_specs(nz, ny, nx, tz, ty):
    grid = (nz // tz, ny // ty)
    int_spec = pl.BlockSpec((tz, ty, nx), lambda k, j: (k, j, 0))
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    return grid, int_spec, any_spec, smem_spec


def fused_mom_rk(u, v, w, s, p, ue, ve, we, se, pe, ruo, rvo, rwo,
                 dzci, dzfi, f1, f2, visc, dxi, dyi, bforce, interpret=False,
                 y_ext=False, split=None, xe=None, xze=None,
                 ye=None, yze=None, ywalls=(False, False),
                 fuse_fillps=False, wrec=None, sum_flags=(False, False),
                 xop=None, ystrips=None, has_ruo=True, has_sgs=True,
                 sca=None, scae=None, rso=None, scal_params=(0.0, 0.0),
                 ywf=None, fold_cn=False, xye=False, xstrips=None):
    """Momentum RHS + RK3 update in one HBM pass.

    u..p: interior (nz, ny, nx) fields; ue..pe: (3, ny, nx) z-edge stacks
    (boundary.zedge_*); ruo..rwo: previous explicit RHS; f1, f2: traced RK
    factors.  x, y periodic (closed in-kernel).  Returns
    (u, v, w, ru, rv, rw) interiors, or None if no tiling fits (caller
    falls back to the XLA path).  y_ext=True: u..p and ue..pe carry 8
    exchanged y-halo rows per side (the shard_map path); ruo..rwo and the
    outputs stay interior-sized.

    split: implicit-diffusion RHS split (mom.f90:277-303): None = fully
    explicit; '1d' = z diffusion implicit; 'xy+z' = all molecular diffusion
    implicit.  With a split the velocity outputs include the FULL f12*rd
    diffusive update (the caller subtracts 0.5*f12*rd before its CN
    Helmholtz solves, main.f90:423-431) and three extra outputs
    (rud, rvd, rwd) carry the implicit RHS parts — unless fold_cn, where
    the kernel emits u_RK - 0.5*f12*rd (the CN RHS) directly, the rd
    outputs are elided (3 HBM streams + the caller's subtraction pass
    saved), and the sum_flags partial sums still measure the FULL
    prediction for the bulk-forcing controller.

    xe/xze: packed x-ghost-column bundle (+ its z-edge stack) for x-SHARDED
    runs — see _PlaneAccessor; lane layout 2m/2m+1 for window field m in
    (u, v, w, s, p) order.

    ye/yze + ywalls: packed 16-row y-edge bundle (+ its z-edge corner
    stack) for y-WALLED configs (duct/cavity class): rows 3m+0/1/2 = lo
    ghost / hi ghost / padded-ny row per field; the wall-adjacent tiles'
    wrap rows are fixed in-register (_PlaneAccessor._fix_y).

    ywf: traced (2,) per-shard wall flags for SHARDED y-walled runs
    (ystrips + ye together): the bundle is the GLOBAL one (its lo rows are
    only read on the shard owning the lo wall, hi rows on the hi-wall
    shard), and the in-kernel wall fixes fire only where ywf says this
    shard touches a wall; interior shards read their ppermute'd strips."""
    nz, ny, nx = u.shape
    if y_ext:
        ny -= 16
    dt = u.dtype
    if nx % 128 or ny % 8:
        return None
    has_scal = sca is not None
    # the fused scalar composes with every window protocol (its window,
    # xe lanes 2m/2m+1, ye rows 3m and halo strips are all field-generic);
    # only the fillps fusion (channel-class opt-in) excludes it
    assert not (has_scal and fuse_fillps), \
        'fused scalar: not with the mom+fillps fusion'
    assert not (fold_cn and split is None)
    tiles = mom_tiles(nz, ny, dt.itemsize, nx, split=split,
                      has_scal=has_scal, fold_cn=fold_cn)
    if tiles is None:
        return None
    tz, ty = tiles

    has_ywf = ywf is not None
    scs = [jnp.asarray(f1, dt), jnp.asarray(f2, dt)]
    if has_ywf:
        scs += [jnp.asarray(ywf[0], dt), jnp.asarray(ywf[1], dt)]
    sc = jnp.stack(scs).reshape(1, len(scs))
    dzci_s = jnp.asarray(dzci, dt).reshape(-1, 1)
    dzfi_s = jnp.asarray(dzfi, dt).reshape(-1, 1)

    has_xe = xe is not None
    has_ye = ye is not None
    has_xop = xop is not None
    has_ystrips = ystrips is not None
    has_xstrips = xstrips is not None
    if fuse_fillps:
        assert split is None and not y_ext and not has_xe and not has_ye
    if has_ystrips:
        # x-walled sharded runs pass the host-built xe bundle with its
        # own 8-row strip pack (xstrips)
        assert not y_ext and (not has_xe or has_xstrips)
    assert not has_xstrips or (has_xe and has_ystrips)
    nout = (6 if split is None or fold_cn else 9) + 2 * has_scal
    nf = 4 + has_sgs + has_scal
    nwin = nf + has_xe + has_ye
    gj = ny // ty
    grid, int_spec, any_spec, smem_spec = _grid_specs(nz, ny, nx, tz, ty)
    kern = _mom_kernel(tz, ty, nz, ny, nx, float(visc), float(dxi), float(dyi),
                       tuple(float(b) for b in bforce), interpret,
                       y_ext=y_ext, split=split, has_xe=has_xe,
                       ywalls=ywalls if has_ye else (False, False),
                       fuse_fillps=fuse_fillps, wrec=wrec,
                       sum_flags=sum_flags, has_xop=has_xop,
                       has_ystrips=has_ystrips, has_ruo=has_ruo,
                       has_sgs=has_sgs, has_scal=has_scal,
                       alpha_s=float(scal_params[0]),
                       ssource=float(scal_params[1]), has_ywf=has_ywf,
                       fold_cn=fold_cn, xye=xye and has_xe and has_ye,
                       has_xstrips=has_xstrips)
    xargs = (xe, xze) if has_xe else ()
    yargs = (ye, yze) if has_ye else ()
    sargs = tuple(ystrips) if has_ystrips else ()
    if has_xstrips:
        sargs = sargs + tuple(xstrips)
    rargs = (ruo, rvo, rwo) if has_ruo else ()
    if has_ruo and has_scal:
        rargs = rargs + (rso,)
    fargs = ((rvo,) if fuse_fillps and has_ruo
             else ())                         # rvo again, halo-strip source
    mat_spec = pl.BlockSpec((nx, nx), lambda k, j: (0, 0))
    if has_xop:
        fargs = fargs + (jnp.asarray(xop, dt),)
    out_specs = [int_spec] * nout
    out_shape = [jax.ShapeDtypeStruct((nz, ny, nx), dt)] * nout
    fextra = []
    if fuse_fillps:
        out_specs.append(int_spec)
        out_shape.append(jax.ShapeDtypeStruct((nz, ny, nx), dt))
        fextra = [pltpu.VMEM((tz, 8, nx), dt),
                  pltpu.VMEM((gj, ty, nx), dt),
                  pltpu.SemaphoreType.DMA(())]
    sum_spec = pl.BlockSpec((tz, 8, 128), lambda k, j: (k, j, 0))
    for flag in sum_flags:
        if flag:
            out_specs.append(sum_spec)
            out_shape.append(jax.ShapeDtypeStruct((nz, gj * 8, 128), dt))
    # in-place rhs carry: ruo/rvo/rwo are read pointwise through the SAME
    # output-aligned int_spec blocks as the ru/rv/rw outputs (no stencil,
    # no inter-block overlap), and are dead after the call — aliasing the
    # pairs removes the unaliased in+out DMA-stream conflict that caps
    # Pallas streaming at ~half bandwidth (tools/solve_probe6.py).  Not
    # with fuse_fillps (rvo is also passed as a second, ANY-space operand).
    aliases = {}
    if has_ruo and not fuse_fillps and not _no_alias_io():
        ridx = 3 + 2 * nf + 2 * (has_xe + has_ye + has_ystrips
                                 + has_xstrips)
        aliases = {ridx: 3, ridx + 1: 4, ridx + 2: 5}
        if has_scal:
            # dsdt carry in place alongside the momentum-RHS carries
            aliases[ridx + 3] = (6 if split is None or fold_cn else 9) + 1
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[smem_spec, smem_spec, smem_spec]
                 + [any_spec] * (2 * nf + 2 * has_xe + 2 * has_ye
                                 + 2 * has_ystrips + 2 * has_xstrips)
                 + [int_spec] * len(rargs)
                 + [any_spec] * (len(fargs) - has_xop)
                 + [mat_spec] * has_xop,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        scratch_shapes=[pltpu.VMEM((2, tz + 2, ty + 16, nx), dt)
                        for _ in range(nf)]
                       + ([pltpu.VMEM((2, tz + 2, ty + 16, 128), dt)]
                          if has_xe else [])
                       + ([pltpu.VMEM((2, tz + 2, ye.shape[1], nx), dt)]
                          if has_ye else [])
                       + fextra
                       + [pltpu.SemaphoreType.DMA((2, nwin, 9))],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(sc, dzci_s, dzfi_s,
      *((u, v, w, s, p, ue, ve, we, se, pe) if has_sgs
        else (u, v, w, p, ue, ve, we, pe)),
      *((sca, scae) if has_scal else ()),
      *xargs, *yargs, *sargs, *rargs, *fargs)
    return outs


def _smag_kernel(tz, ty, nz, ny, nx, dxi, dyi, visc, have_zwalls, interpret,
                 y_ext=False, has_xe=False, has_ystrips=False):
    """strain rate + nu_t = (Cs*Delta(z)*fd)^2 |S| in one pass.

    van Driest damping for the z-walls-only case (channel/Couette class,
    sgs.f90:104-149): fd = 1 - exp(-dw(z) sqrt(0.5 visc tauw(y,x)) / visc
    / 25) with tauw selected from the nearer wall's plane by a 1D z mask.
    have_zwalls=False skips fd (fd=1, tri-periodic class).
    """
    def kernel(csd2_s, dw_s, msk_s, dzci_s, dzfi_s, u, v, w, ue, ve, we,
               *rest):
        rest = list(rest)
        xe = xze = yh = yhz = None
        if has_xe:
            xe, xze = rest[0], rest[1]
            del rest[0:2]
        if has_ystrips:
            yh, yhz = rest[0], rest[1]
            del rest[0:2]
        tlo, thi, s_o, su2, sv2, sw2 = rest[0:6]
        sxe2 = rest[6] if has_xe else None
        sems = rest[-1]
        k = pl.program_id(0)
        j = pl.program_id(1)
        z0 = k * tz
        specs = [(u, ue, su2), (v, ve, sv2), (w, we, sw2)]
        if has_xe:
            specs.append((xe, xze, sxe2))
        if has_ystrips:
            specs = [e + (('strips', yh, yhz, 16 * m),)
                     for m, e in enumerate(specs)]
        wins = _pipelined_windows(specs, sems, nz, ny, tz, ty, k, j,
                                  interpret, y_ext=y_ext)
        su, sv, sw = wins[0:3]
        sxe = wins[3] if has_xe else None

        def body(kk, _):
            kz = z0 + kk + 1
            acc = _PlaneAccessor({id(su): su, id(sv): sv, id(sw): sw},
                                 kk, ty, interpret=interpret, xe=sxe,
                                 xlane={id(su): 0, id(sv): 1, id(sw): 2})
            metrics = {
                'dzci_c': dzci_s[kz, 0],
                'dzci_m': dzci_s[kz - 1, 0],
                'dzfi_c': dzfi_s[kz, 0],
            }
            s0 = st.strain_rate_core(acc.V, metrics.__getitem__,
                                     su, sv, sw, dxi, dyi)
            if have_zwalls:
                tauw = jnp.where(msk_s[kz, 0] > 0.5, tlo[0], thi[0])
                tauw_s = 0.5 * visc * tauw
                dw_plus = dw_s[kz, 0] * jnp.sqrt(tauw_s) / visc
                fd = 1.0 - jnp.exp(-dw_plus / 25.0)
                s_o[kk] = csd2_s[kz, 0] * fd * fd * s0
            else:
                s_o[kk] = csd2_s[kz, 0] * s0
            return 0

        jax.lax.fori_loop(0, tz, body, 0)
    return kernel


def fused_smag(u, v, w, ue, ve, we, dzci, dzfi, dxi, dyi, visc, cs_delta2_1d,
               dw_1d=None, nearlo_1d=None, tauw_lo=None, tauw_hi=None,
               interpret=False, y_ext=False, xe=None, xze=None,
               ystrips=None):
    """Static Smagorinsky nu_t in one pass (z walls or no walls).

    u, v, w: interior (nz, ny, nx); ue, ve, we: (3, ny, nx) z-edge stacks
    (with any lwm one-sided extrapolation already folded in by the caller);
    cs_delta2_1d: (Cs*Delta(z))^2 profile (nz,); dw_1d: nearest-z-wall
    distance profile; nearlo_1d: 1 where the lower wall is nearer;
    tauw_lo/hi: |grad u_par| wall planes (ny, nx) (the sgs.f90:117-143
    one-sided estimates, computed by the caller from the wall-adjacent
    slices).  Returns (nz, ny, nx) nu_t or None.  y_ext: see fused_mom_rk
    (tauw planes stay interior-sized)."""
    nz, ny, nx = u.shape
    if y_ext:
        ny -= 16
    dt = u.dtype
    if nx % 128 or ny % 8:
        return None
    tiles = pick_tiles(nz, ny, dt.itemsize, nx, nwin=6, nio=1)
    if tiles is None:
        return None
    tz, ty = tiles
    have_zwalls = dw_1d is not None

    def prof(p_):
        return jnp.zeros((nz + 2,), dt).at[1:nz + 1].set(
            jnp.asarray(p_, dt)).reshape(-1, 1)

    csd2 = prof(cs_delta2_1d)
    dw = prof(dw_1d if have_zwalls else np.zeros(nz))
    msk = prof(nearlo_1d if have_zwalls else np.zeros(nz))
    dzci_s = jnp.asarray(dzci, dt).reshape(-1, 1)
    dzfi_s = jnp.asarray(dzfi, dt).reshape(-1, 1)
    if tauw_lo is None:
        tauw_lo = jnp.zeros((1, ny, nx), dt)
        tauw_hi = jnp.zeros((1, ny, nx), dt)
    else:
        tauw_lo = jnp.asarray(tauw_lo, dt).reshape(1, ny, nx)
        tauw_hi = jnp.asarray(tauw_hi, dt).reshape(1, ny, nx)

    has_xe = xe is not None
    has_ystrips = ystrips is not None
    grid, int_spec, any_spec, smem_spec = _grid_specs(nz, ny, nx, tz, ty)
    plane_spec = pl.BlockSpec((1, ty, nx), lambda k, j: (0, j, 0))
    kern = _smag_kernel(tz, ty, nz, ny, nx, float(dxi), float(dyi),
                        float(visc), have_zwalls, interpret, y_ext=y_ext,
                        has_xe=has_xe, has_ystrips=has_ystrips)
    xargs = (xe, xze) if has_xe else ()
    sargs = tuple(ystrips) if has_ystrips else ()
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[smem_spec] * 5
                 + [any_spec] * (6 + 2 * has_xe + 2 * has_ystrips)
                 + [plane_spec] * 2,
        out_specs=int_spec,
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), dt),
        scratch_shapes=[pltpu.VMEM((2, tz + 2, ty + 16, nx), dt)
                        for _ in range(3)]
                       + ([pltpu.VMEM((2, tz + 2, ty + 16, 128), dt)]
                          if has_xe else [])
                       + [pltpu.SemaphoreType.DMA((2, 3 + has_xe, 9))],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(csd2, dw, msk, dzci_s, dzfi_s, u, v, w, ue, ve, we, *xargs, *sargs,
      tauw_lo, tauw_hi)


def _fillps_kernel(tz, ty, nz, ny, nx, dxi, dyi, interpret, y_ext=False,
                   has_xe=False, ywalls=(False, False), has_ystrips=False,
                   has_xop=False, has_yop=False, has_ywf=False, xye=False,
                   has_xstrips=False):
    has_ye = any(ywalls)
    gj = ny // ty

    def kernel(sc, dzfi_s, u, v, w, ue, ve, we, *rest):
        rest = list(rest)
        xe = xze = ye = yze = yh = yhz = xh = xhz = None
        if has_xe:
            xe, xze = rest[0], rest[1]
            del rest[0:2]
        if has_ye:
            ye, yze = rest[0], rest[1]
            del rest[0:2]
        if has_ystrips:
            yh, yhz = rest[0], rest[1]
            del rest[0:2]
        if has_xstrips:
            xh, xhz = rest[0], rest[1]
            del rest[0:2]
        xop = rest.pop(0) if has_xop else None
        oyt = rest.pop(0) if has_yop else None
        rhs_o, su2, sv2, sw2 = rest[0:4]
        del rest[0:4]
        sxe2 = sye2 = None
        if has_xe:
            sxe2 = rest.pop(0)
        if has_ye:
            sye2 = rest.pop(0)
        sems = rest[-1]
        k = pl.program_id(0)
        j = pl.program_id(1)
        z0 = k * tz
        specs = [(u, ue, su2), (v, ve, sv2), (w, we, sw2)]
        if has_ystrips:
            specs = [e + (('strips', yh, yhz, 16 * m),)
                     for m, e in enumerate(specs)]
        if has_xe:
            xsp = (xe, xze, sxe2)
            if has_xstrips:
                xsp = xsp + (('strips', xh, xhz, 0),)
            specs.append(xsp)
        if has_ye:
            specs.append((ye, yze, sye2, 'ally'))
        wins = _pipelined_windows(specs, sems, nz, ny, tz, ty, k, j,
                                  interpret, y_ext=y_ext)
        su, sv, sw = wins[0:3]
        sxe = wins[3] if has_xe else None
        sye = wins[3 + has_xe] if has_ye else None
        y_lo = (j == 0) if ywalls[0] else None
        y_hi = (j == gj - 1) if ywalls[1] else None
        if has_ywf:
            y_lo = (y_lo & (sc[0, 1] > 0.5)) if ywalls[0] else None
            y_hi = (y_hi & (sc[0, 2] > 0.5)) if ywalls[1] else None
        dti = sc[0, 0]

        def body(kk, _):
            kz = z0 + kk + 1
            acc = _PlaneAccessor({id(su): su, id(sv): sv, id(sw): sw},
                                 kk, ty, interpret=interpret, xe=sxe,
                                 xlane={id(su): 0, id(sv): 1, id(sw): 2},
                                 ye=sye,
                                 ylane={id(su): 0, id(sv): 3, id(sw): 6},
                                 ystag={id(sv)}, y_lo=y_lo, y_hi=y_hi,
                                 xe_ybase=9 if xye else None)
            rhs = ((acc.V(sw) - acc.V(sw, k=-1)) * dti * dzfi_s[kz, 0]
                   + (acc.V(sv) - acc.V(sv, j=-1)) * (dti * dyi)
                   + (acc.V(su) - acc.V(su, i=-1)) * (dti * dxi))
            if has_xop:
                # forward x transform (the solve's first stage) on the MXU
                rhs = _dot_xop(rhs, xop[:, :])
            if has_yop:
                # forward y transform via per-tile contraction into a
                # revisited (tz, ny, nx) output block (the solve's second
                # stage; Oy^T block rows = this tile's y rows):
                # out[ky, kx] += sum_y OyT[y, ky] rhs[y, kx]
                contrib = _dot_xop(oyt[:, :], rhs,
                                   dims=(((0,), (0,)), ((), ())))

                @pl.when(j == 0)
                def _():
                    rhs_o[kk] = contrib

                @pl.when(j > 0)
                def _():
                    rhs_o[kk] += contrib
                return 0
            rhs_o[kk] = rhs
            return 0

        jax.lax.fori_loop(0, tz, body, 0)
    return kernel


def fused_fillps(u, v, w, ue, ve, we, dzfi, dti, dxi, dyi, interpret=False,
                 y_ext=False, xe=None, xze=None, ye=None, yze=None,
                 ywalls=(False, False), ystrips=None, xop=None, yop=None,
                 ywf=None, xye=False, xstrips=None):
    """Poisson RHS div(u)/dt_rk in one pass (fillps.f90:14-48).

    u, v, w: prediction-velocity interiors; ue, ve, we: prediction-fill
    z-edge stacks; dti: traced 1/dt_rk.  Returns (nz, ny, nx) or None.
    y_ext: see fused_mom_rk.  xe/xze: x-ghost bundle in (u, v, w) lane
    order for x-sharded runs.  ye/yze + ywalls: y-edge bundle (rows
    3m+0/1/2 per field) — v's padded-ny rewrite row is REQUIRED here (the
    prediction fill's wall-face value enters the divergence)."""
    nz, ny, nx = u.shape
    if y_ext:
        ny -= 16
    dt = u.dtype
    if nx % 128 or ny % 8:
        return None
    tiles = pick_tiles(nz, ny, dt.itemsize, nx, nwin=6, nio=1)
    if tiles is None:
        return None
    tz, ty = tiles
    has_ywf = ywf is not None
    scs = [jnp.asarray(dti, dt)]
    if has_ywf:
        scs += [jnp.asarray(ywf[0], dt), jnp.asarray(ywf[1], dt)]
    sc = jnp.stack(scs).reshape(1, len(scs))
    dzfi_s = jnp.asarray(dzfi, dt).reshape(-1, 1)
    has_xe = xe is not None
    has_ye = ye is not None
    has_ystrips = ystrips is not None
    has_xstrips = xstrips is not None
    has_xop = xop is not None
    has_yop = yop is not None
    xargs = (xe, xze) if has_xe else ()
    yargs = (ye, yze) if has_ye else ()
    sargs = tuple(ystrips) if has_ystrips else ()
    if has_xstrips:
        sargs = sargs + tuple(xstrips)
    oargs = (jnp.asarray(xop, dt),) if has_xop else ()
    mat_specs = [pl.BlockSpec((nx, nx), lambda k, j: (0, 0))] * has_xop
    if has_yop:
        # Oy^T blocked by y tile (rows j*ty..) so no traced lane slicing
        oargs = oargs + (jnp.asarray(yop, dt).T.copy(),)
        mat_specs.append(pl.BlockSpec((ty, ny), lambda k, j: (j, 0)))
    nwin = 3 + has_xe + has_ye
    grid, int_spec, any_spec, smem_spec = _grid_specs(nz, ny, nx, tz, ty)
    out_spec = (pl.BlockSpec((tz, ny, nx), lambda k, j: (k, 0, 0))
                if has_yop else int_spec)
    kern = _fillps_kernel(tz, ty, nz, ny, nx, float(dxi), float(dyi),
                          interpret, y_ext=y_ext, has_xe=has_xe,
                          ywalls=ywalls if has_ye else (False, False),
                          has_ystrips=has_ystrips, has_xop=has_xop,
                          has_yop=has_yop, has_ywf=has_ywf,
                          xye=xye and has_xe and has_ye,
                          has_xstrips=has_xstrips)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[smem_spec, smem_spec]
                 + [any_spec] * (6 + 2 * has_xe + 2 * has_ye
                                 + 2 * has_ystrips + 2 * has_xstrips)
                 + mat_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), dt),
        scratch_shapes=[pltpu.VMEM((2, tz + 2, ty + 16, nx), dt)
                        for _ in range(3)]
                       + ([pltpu.VMEM((2, tz + 2, ty + 16, 128), dt)]
                          if has_xe else [])
                       + ([pltpu.VMEM((2, tz + 2, ye.shape[1], nx), dt)]
                          if has_ye else [])
                       + [pltpu.SemaphoreType.DMA((2, nwin, 9))],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(sc, dzfi_s, u, v, w, ue, ve, we, *xargs, *yargs, *sargs, *oargs)


def _roll_rows_up(p, interpret):
    """plane with row r holding input row r+1 (sublane roll; the wrapped
    last row is never read by the callers)."""
    if interpret:
        return jnp.roll(p, -1, axis=0)
    return pltpu.roll(p, p.shape[0] - 1, 0)


def _correc_smag_kernel(tz, ty, nz, ny, nx, dxi, dyi, visc, have_zwalls,
                        zrec, interpret, has_xopi=False):
    """Velocity correction + pressure update + static-Smagorinsky nu_t in
    ONE pass: the strain rate is evaluated on corrected values built
    in-register from the prediction windows + the pp window (correc.f90 +
    updatep.f90 + sgs.f90:69-152 fused).  Single-chip, periodic x/y,
    non-periodic z, scalar BCs, no wall model (timeloop gates).

    zrec: per-field (u, v) z-ghost recipes (lt_lo, b_lo, dr_lo, lt_hi,
    b_hi, dr_hi) — the post-correction fill's ghosts are synthesized from
    corrected interior planes (the prediction ghosts corrected in-head
    would carry the pre-projection gradient, which is wrong for D/N
    letters); w's z=0 face keeps its corrected value (impose_norm_bc
    =.false.) so its generic in-head correction IS the post-fill value."""
    klast = nz // tz - 1

    def kernel(sc, dzci_s, dzfi_s, csd2_s, dw_s, msk_s,
               u, v, w, pp, ue, ve, we, ppe, *rest):
        rest = list(rest)
        xopi = rest.pop(0) if has_xopi else None
        tlo, thi, p_i, u_o, v_o, w_o, p_o, s_o = rest[0:8]
        del rest[0:8]
        su2, sv2, sw2, spp2 = rest[0:4]
        del rest[0:4]
        ppph = rest.pop(0) if has_xopi else None
        sems = rest[-1]
        k = pl.program_id(0)
        j = pl.program_id(1)
        z0 = k * tz
        su, sv, sw, spp = _pipelined_windows(
            [(u, ue, su2), (v, ve, sv2), (w, we, sw2), (pp, ppe, spp2)],
            sems, nz, ny, tz, ty, k, j, interpret)
        if has_xopi:
            # inverse x transform of the solver output on the idle MXU
            # (the solve's last stage): phys = hat @ OxInvT, once per
            # window plane per tile
            for r in range(tz + 2):
                ppph[r] = _dot_xop(spp[r], xopi[:, :])
            spp = ppph
        dtrk = sc[0, 0]
        fu = sc[0, 2]     # deferred bulk-forcing constants (fused-fillps
        fv = sc[0, 3]     # momentum path; zero otherwise)

        def ghost(letters_b_dr, side, q1, q2):
            """z-ghost plane from the corrected first/last interior plane
            q1 (+ the next-inner plane q2 for the wall-model 'E' recipe:
            the one-sided lwm extrapolation, sgs.f90:682-767)."""
            lt, b, dr = letters_b_dr[3 * side:3 * side + 3]
            if lt == 'D':
                return 2.0 * b - q1
            if lt == 'E':
                return (1.0 + b) * q1 - b * q2
            return (-dr * b + q1) if side == 0 else (dr * b + q1)

        def body(kk, _):
            kz = z0 + kk + 1
            acc = _PlaneAccessor(
                {id(su): su, id(sv): sv, id(sw): sw, id(spp): spp},
                kk, ty, interpret=interpret)
            ccache = {}

            def cbase(P, dk, raw=False):
                """corrected plane at z offset dk (cached).  raw=True skips
                the global z-ghost substitution — the next-inner interior
                plane feeding the 'E' extrapolation recipe (never itself a
                ghost row)."""
                if ('b', id(P), dk, raw) in ccache:
                    return ccache[('b', id(P), dk, raw)]
                ppc = acc.plane(spp, dk, 0)
                if P is sw:
                    q = acc.plane(sw, dk, 0) - dtrk * dzci_s[kz + dk, 0] * (
                        acc.plane(spp, dk + 1, 0) - ppc)
                elif P is su:
                    q = fu + acc.plane(su, dk, 0) - dtrk * dxi * (
                        acc.plane(spp, dk, 1) - ppc)
                else:
                    q = fv + acc.plane(sv, dk, 0) - dtrk * dyi * (
                        _roll_rows_up(ppc, interpret) - ppc)
                if P is not sw and dk != 0 and not raw:
                    # global z-ghost planes: post-fill synthesis from the
                    # corrected first/last interior plane
                    rec = zrec[0] if P is su else zrec[1]
                    if dk == -1:
                        cond = jnp.logical_and(k == 0, kk == 0)
                        q2 = (cbase(P, 1, raw=True)
                              if rec[0] == 'E' else None)
                        q = jnp.where(cond, ghost(rec, 0,
                                                  cbase(P, 0), q2), q)
                    else:
                        cond = jnp.logical_and(k == klast, kk == tz - 1)
                        q2 = (cbase(P, -1, raw=True)
                              if rec[3] == 'E' else None)
                        q = jnp.where(cond, ghost(rec, 1,
                                                  cbase(P, 0), q2), q)
                ccache[('b', id(P), dk, raw)] = q
                return q

            def cplane(P, dk, di):
                key = ('p', id(P), dk, di)
                if key not in ccache:
                    p = cbase(P, dk)
                    if di == 1:
                        p = (_np_roll_variant(p, 1) if interpret
                             else _roll_xp(p))
                    elif di == -1:
                        p = (_np_roll_variant(p, -1) if interpret
                             else _roll_xm(p))
                    ccache[key] = p
                return ccache[key]

            def cV(P, k=0, j=0, i=0):
                return cplane(P, k, i)[8 + j:8 + j + ty]

            u_o[kk] = cV(su)
            v_o[kk] = cV(sv)
            w_o[kk] = cV(sw)
            p_o[kk] = p_i[kk] + acc.V(spp)

            metrics = {
                'dzci_c': dzci_s[kz, 0],
                'dzci_m': dzci_s[kz - 1, 0],
                'dzfi_c': dzfi_s[kz, 0],
            }
            s0 = st.strain_rate_core(cV, metrics.__getitem__,
                                     su, sv, sw, dxi, dyi)
            if have_zwalls:
                tauw = jnp.where(msk_s[kz, 0] > 0.5, tlo[0], thi[0])
                tauw_s = 0.5 * visc * tauw
                dw_plus = dw_s[kz, 0] * jnp.sqrt(tauw_s) / visc
                fd = 1.0 - jnp.exp(-dw_plus / 25.0)
                s_o[kk] = csd2_s[kz, 0] * fd * fd * s0
            else:
                s_o[kk] = csd2_s[kz, 0] * s0
            return 0

        jax.lax.fori_loop(0, tz, body, 0)
    return kernel


def fused_correc_updatep_smag(u, v, w, pp, p, ue, ve, we, ppe, dtrk,
                              dxi, dyi, dzci, dzfi, visc, cs_delta2_1d,
                              zrec, dw_1d=None, nearlo_1d=None,
                              tauw_lo=None, tauw_hi=None, interpret=False,
                              fu=0.0, fv=0.0, xopi=None, alias_p=False):
    """Projection + pressure update + static Smagorinsky in one HBM pass
    (explicit-diffusion channel class): reads the prediction-velocity and
    solver-output windows ONCE and emits (u, v, w, p, nu_t) — removes the
    separate smag kernel's 3 window reads + 1 write per substep.

    ue/ve/we: PREDICTION z-edge stacks (is_correc=False); zrec: z-ghost
    recipes for (u, v) — see _correc_smag_kernel; tauw planes are computed
    by the caller from the host-side-corrected wall-adjacent planes."""
    nz, ny, nx = u.shape
    dt = u.dtype
    if nx % 128 or ny % 8:
        return None
    tiles = pick_tiles(nz, ny, dt.itemsize, nx, nwin=8, nio=6)
    if tiles is None:
        return None
    tz, ty = tiles
    sc = jnp.stack([jnp.asarray(dtrk, dt), jnp.asarray(0.0, dt),
                    jnp.asarray(fu, dt),
                    jnp.asarray(fv, dt)]).reshape(1, 4)
    dzci_s = jnp.asarray(dzci, dt).reshape(-1, 1)
    dzfi_s = jnp.asarray(dzfi, dt).reshape(-1, 1)
    have_zwalls = dw_1d is not None

    def prof(p_):
        return jnp.zeros((nz + 2,), dt).at[1:nz + 1].set(
            jnp.asarray(p_, dt)).reshape(-1, 1)

    csd2 = prof(cs_delta2_1d)
    dw = prof(dw_1d if have_zwalls else np.zeros(nz))
    msk = prof(nearlo_1d if have_zwalls else np.zeros(nz))
    if tauw_lo is None:
        tauw_lo = jnp.zeros((1, ny, nx), dt)
        tauw_hi = jnp.zeros((1, ny, nx), dt)
    else:
        tauw_lo = jnp.asarray(tauw_lo, dt).reshape(1, ny, nx)
        tauw_hi = jnp.asarray(tauw_hi, dt).reshape(1, ny, nx)

    has_xopi = xopi is not None
    grid, int_spec, any_spec, smem_spec = _grid_specs(nz, ny, nx, tz, ty)
    plane_spec = pl.BlockSpec((1, ty, nx), lambda k, j: (0, j, 0))
    mat_spec = pl.BlockSpec((nx, nx), lambda k, j: (0, 0))
    kern = _correc_smag_kernel(tz, ty, nz, ny, nx, float(dxi), float(dyi),
                               float(visc), have_zwalls, zrec, interpret,
                               has_xopi=has_xopi)
    xargs = (jnp.asarray(xopi, dt),) if has_xopi else ()
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[smem_spec] * 6 + [any_spec] * 8 + [mat_spec] * has_xopi
                 + [plane_spec] * 2 + [int_spec],
        out_specs=[int_spec] * 5,
        out_shape=[jax.ShapeDtypeStruct((nz, ny, nx), dt)] * 5,
        # p is the only output-aligned pointwise input here (u/v/w come in
        # as stencil windows); alias it when the caller's donor is an
        # intermediate — see fused_mom_rk's alias note
        input_output_aliases=(
            {6 + 8 + has_xopi + 2: 3}
            if alias_p and not _no_alias_io() else {}),
        scratch_shapes=[pltpu.VMEM((2, tz + 2, ty + 16, nx), dt)
                        for _ in range(4)]
                       + ([pltpu.VMEM((tz + 2, ty + 16, nx), dt)]
                          if has_xopi else [])
                       + [pltpu.SemaphoreType.DMA((2, 4, 9))],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(sc, dzci_s, dzfi_s, csd2, dw, msk, u, v, w, pp, ue, ve, we, ppe,
      *xargs, tauw_lo, tauw_hi, p)


def _correc_kernel(tz, ty, nz, ny, nx, dxi, dyi, interpret, y_ext=False,
                   impdiff=False, impdiff_1d=False, has_xe=False,
                   ywalls=(False, False), has_ystrips=False, has_ywf=False,
                   xye=False, has_xopi=False, has_xstrips=False):
    has_ye = any(ywalls)
    gj = ny // ty

    def kernel(sc, dzci_s, dzfi_s, w, pp, we, ppe, *rest):
        rest = list(rest)
        xe = xze = ye = yze = yh = yhz = xh = xhz = None
        if has_xe:
            xe, xze = rest[0], rest[1]
            del rest[0:2]
        if has_ye:
            ye, yze = rest[0], rest[1]
            del rest[0:2]
        if has_ystrips:
            yh, yhz = rest[0], rest[1]
            del rest[0:2]
        if has_xstrips:
            xh, xhz = rest[0], rest[1]
            del rest[0:2]
        xopi = rest.pop(0) if has_xopi else None
        (u_i, v_i, p_i, u_o, v_o, w_o, p_o, sw2, spp2) = rest[0:9]
        del rest[0:9]
        sxe2 = sye2 = None
        if has_xe:
            sxe2 = rest.pop(0)
        if has_ye:
            sye2 = rest.pop(0)
        ppph = rest.pop(0) if has_xopi else None
        sems = rest[-1]
        k = pl.program_id(0)
        j = pl.program_id(1)
        z0 = k * tz
        specs = [(w, we, sw2), (pp, ppe, spp2)]
        if has_ystrips:
            specs = [e + (('strips', yh, yhz, 16 * m),)
                     for m, e in enumerate(specs)]
        if has_xe:
            xsp = (xe, xze, sxe2)
            if has_xstrips:
                xsp = xsp + (('strips', xh, xhz, 0),)
            specs.append(xsp)
        if has_ye:
            specs.append((ye, yze, sye2, 'ally'))
        wins = _pipelined_windows(specs, sems, nz, ny, tz, ty, k, j,
                                  interpret, y_ext=y_ext)
        sw, spp = wins[0:2]
        sxe = wins[2] if has_xe else None
        sye = wins[2 + has_xe] if has_ye else None
        if has_xopi:
            # inverse x transform of the solver output on the idle MXU
            # (the solve's last stage) — see _correc_smag_kernel
            for r in range(tz + 2):
                ppph[r] = _dot_xop(spp[r], xopi[:, :])
            spp = ppph
        y_lo = (j == 0) if ywalls[0] else None
        y_hi = (j == gj - 1) if ywalls[1] else None
        if has_ywf:
            y_lo = (y_lo & (sc[0, 4] > 0.5)) if ywalls[0] else None
            y_hi = (y_hi & (sc[0, 5] > 0.5)) if ywalls[1] else None
        dtrk = sc[0, 0]
        alpha = sc[0, 1]
        fu = sc[0, 2]     # deferred bulk-forcing constants (fused-fillps
        fv = sc[0, 3]     # momentum path; zero otherwise)

        def body(kk, _):
            kz = z0 + kk + 1
            acc = _PlaneAccessor({id(sw): sw, id(spp): spp}, kk, ty,
                                 interpret=interpret, xe=sxe,
                                 xlane={id(sw): 0, id(spp): 1},
                                 ye=sye, ylane={id(sw): 0, id(spp): 3},
                                 y_lo=y_lo, y_hi=y_hi,
                                 xe_ybase=9 if xye else None)
            ppc = acc.V(spp)
            vin = v_i[kk]
            if ywalls[1]:
                # v's interior last row is the wall face: the prediction
                # fill's set_bc rewrite (bundle row 8 = v rewrite) must
                # enter the correction (correc.f90:45-67 padded sweep)
                riota = jax.lax.broadcasted_iota(jnp.int32, vin.shape, 0)
                vrw = sye[kk + 1][8:9]
                vin = jnp.where((riota == ty - 1) & y_hi, vrw, vin)
            u_o[kk] = fu + u_i[kk] - dtrk * dxi * (acc.V(spp, i=1) - ppc)
            v_o[kk] = fv + vin - dtrk * dyi * (acc.V(spp, j=1) - ppc)
            w_o[kk] = acc.V(sw) - dtrk * dzci_s[kz, 0] * (acc.V(spp, k=1) - ppc)
            pn = p_i[kk] + ppc
            if impdiff:
                # p += alpha * L(pp) correction (updatep.f90:26-50)
                lap = ((acc.V(spp, k=1) - ppc) * dzci_s[kz, 0]
                       - (ppc - acc.V(spp, k=-1)) * dzci_s[kz - 1, 0]) \
                    * dzfi_s[kz, 0]
                if not impdiff_1d:
                    lap = lap + (acc.V(spp, i=1) - 2.0 * ppc
                                 + acc.V(spp, i=-1)) * dxi * dxi \
                              + (acc.V(spp, j=1) - 2.0 * ppc
                                 + acc.V(spp, j=-1)) * dyi * dyi
                pn = pn + alpha * lap
            p_o[kk] = pn
            return 0

        jax.lax.fori_loop(0, tz, body, 0)
    return kernel


def fused_correc_updatep(u, v, w, pp, p, we, ppe, dtrk, dxi, dyi, dzci,
                         interpret=False, y_ext=False,
                         alpha=0.0, impdiff=False, impdiff_1d=False,
                         dzfi=None, xe=None, xze=None, ye=None, yze=None,
                         ywalls=(False, False), fu=0.0, fv=0.0,
                         ystrips=None, alias_p=False, ywf=None, xye=False,
                         xopi=None, xstrips=None):
    """Velocity correction + pressure update in one pass (correc.f90:14-68,
    updatep.f90:14-24 explicit-diffusion branch).

    u, v, w: prediction interiors (w's window uses the prediction-fill edge
    stack `we`, so the wall-face rewrite of set_bc participates in the
    correction exactly as the reference's padded loop); pp: solver output
    interior with z-edge stack `ppe`; p: pressure interior.  dtrk: traced
    RK factor.  Returns (u, v, w, p_new) interiors or None.  The lower
    wall-face plane (vlo) update is a plane-sized host-side expression done
    by the caller (timeloop).  y_ext: w, pp, we, ppe carry the 8-row y
    halos; u, v, p stay interior-sized (read as output-aligned tiles).
    impdiff/impdiff_1d + alpha (traced scalar) + dzfi: apply the implicit-
    diffusion pressure correction p += alpha*L(pp) (updatep.f90:26-50).
    xopi: (nx, nx) inverse x-transform operator — pp (and ppe) arrive
    x-spectral from the solve's skip_bwd_x path and the window is
    inverse-transformed in-register on the idle MXU (the x-transform
    fusion for the no-smag correc classes: sgs none / impdiff / periodic
    z / y-walled duct+cavity).  Single-chip only (no xe/strips); with ye
    the bundle's pp rows must arrive physical (timeloop inverts them)."""
    nz, ny, nx = u.shape
    dt = u.dtype
    if nx % 128 or ny % 8:
        return None
    tiles = pick_tiles(nz, ny, dt.itemsize, nx, nwin=4 + (xopi is not None),
                       nio=7)
    if tiles is None:
        return None
    tz, ty = tiles
    has_ywf = ywf is not None
    scs = [jnp.asarray(dtrk, dt), jnp.asarray(alpha, dt),
           jnp.asarray(fu, dt), jnp.asarray(fv, dt)]
    if has_ywf:
        scs += [jnp.asarray(ywf[0], dt), jnp.asarray(ywf[1], dt)]
    sc = jnp.stack(scs).reshape(1, len(scs))
    dzci_s = jnp.asarray(dzci, dt).reshape(-1, 1)
    dzfi_s = jnp.asarray(dzfi if dzfi is not None else np.zeros(nz + 2),
                         dt).reshape(-1, 1)
    has_xe = xe is not None
    has_ye = ye is not None
    has_ystrips = ystrips is not None
    has_xstrips = xstrips is not None
    assert not has_xstrips or (has_xe and has_ystrips)
    has_xopi = xopi is not None
    # xopi composes with ye (y-walled duct/cavity class): the window
    # transform runs BEFORE the accessor's ye ghost-row substitution, so
    # the bundle's pp rows must arrive PHYSICAL (the caller inverts them
    # host-side — timeloop builds them from spectral pp via the
    # x-pointwise linear-homogeneous recipes and applies xopi to the rows)
    assert not (has_xopi and (has_xe or has_ystrips or y_ext)), \
        'x-transform fusion: single-chip correc only'
    xargs = (xe, xze) if has_xe else ()
    yargs = (ye, yze) if has_ye else ()
    sargs = tuple(ystrips) if has_ystrips else ()
    if has_xstrips:
        sargs = sargs + tuple(xstrips)
    oargs = (jnp.asarray(xopi, dt),) if has_xopi else ()
    nwin = 2 + has_xe + has_ye
    grid, int_spec, any_spec, smem_spec = _grid_specs(nz, ny, nx, tz, ty)
    kern = _correc_kernel(tz, ty, nz, ny, nx, float(dxi), float(dyi),
                          interpret, y_ext=y_ext, impdiff=impdiff,
                          impdiff_1d=impdiff_1d, has_xe=has_xe,
                          ywalls=ywalls if has_ye else (False, False),
                          has_ystrips=has_ystrips, has_ywf=has_ywf,
                          xye=xye and has_xe and has_ye, has_xopi=has_xopi,
                          has_xstrips=has_xstrips)
    # in-place correction: the u/v prediction inputs (and p with alias_p,
    # substeps where the donor is an intermediate) are read pointwise
    # through the same output-aligned int_spec blocks as the u/v/p outputs
    # and are dead after the call — see fused_mom_rk's alias note
    aliases = {}
    if not _no_alias_io():
        uidx = (3 + 4 + 2 * (has_xe + has_ye + has_ystrips + has_xstrips)
                + has_xopi)
        aliases = {uidx: 0, uidx + 1: 1}
        if alias_p:
            aliases[uidx + 2] = 3
    mat_spec = pl.BlockSpec((nx, nx), lambda k, j: (0, 0))
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[smem_spec, smem_spec, smem_spec]
                 + [any_spec] * (4 + 2 * has_xe + 2 * has_ye
                                 + 2 * has_ystrips + 2 * has_xstrips)
                 + [mat_spec] * has_xopi
                 + [int_spec] * 3,
        out_specs=[int_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((nz, ny, nx), dt)] * 4,
        input_output_aliases=aliases,
        scratch_shapes=[pltpu.VMEM((2, tz + 2, ty + 16, nx), dt)
                        for _ in range(2)]
                       + ([pltpu.VMEM((2, tz + 2, ty + 16, 128), dt)]
                          if has_xe else [])
                       + ([pltpu.VMEM((2, tz + 2, ye.shape[1], nx), dt)]
                          if has_ye else [])
                       + ([pltpu.VMEM((tz + 2, ty + 16, nx), dt)]
                          if has_xopi else [])
                       + [pltpu.SemaphoreType.DMA((2, nwin, 9))],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(sc, dzci_s, dzfi_s, w, pp, we, ppe, *xargs, *yargs, *sargs, *oargs,
      u, v, p)
