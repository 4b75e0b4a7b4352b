"""Pallas TPU mega-kernels for the hot stencil path.

``fused_mom_update`` fuses the momentum RHS (mom.f90:17-309) with the RK3
velocity update (rk.f90:77-94) into a single pass over HBM: each (TZ, TY)
tile DMAs halo-inclusive windows of the padded velocity/eddy-viscosity/
pressure fields from HBM into VMEM scratch (manual async copies — halo
windows are unaligned, which BlockSpec pipelining does not allow), evaluates
the full staggered stencil there with the same jnp expressions as
ops.stencil.momentum_rhs, and writes the updated velocities plus the stored
RHS (the low-storage scheme's ``rhs_old``) through aligned output blocks.
XLA's own fusion splits this region into several multi-pass fusions re-reading
the padded fields; the kernel reads each field once.

Explicit-diffusion path only (the LES production configuration); the
implicit-split variants fall back to the XLA expression path.

STATUS (round 1): numerically validated against the XLA path (interpret mode,
tests/test_pallas_kernels.py) but NOT enabled in the production step.
Findings from on-device experiments (keep for round 2):
  * Mosaic requires DMA slice shapes tile-aligned in the last two dims —
    halo windows over (n+2)-padded arrays are rejected ("must be aligned to
    tiling (8)").  The viable design for periodic-x/y configs (the headline
    channel bench): z-extended-only arrays (nz+2, ny, nx) — aligned — with
    z-tiled windows and in-VMEM `pltpu.roll` for the periodic x/y shifts.
  * A u-component-only kernel in that design compiles in ~157 s, is
    bit-exact vs the XLA expression, and runs 2.14 ms vs XLA's 2.24 ms at
    (256,128,128) — i.e. the single-output kernel has no advantage (XLA
    already fuses one output well); the payoff is the multi-output fused
    kernel (u,v,w + updates in one read of the 5 input fields), whose
    Mosaic compile time grows superlinearly with expression size (>20 min
    for the 3-component body).  Round-2: two-component split or
    common-subexpression hoisting to get compile time tractable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import stencil as st


def _make_kernel(tz, ty, nxp, nz):
    def kernel(sc, dzci_r, dzfi_r,
               up_h, vp_h, wp_h, sp_h, pp_h, ruo, rvo, rwo,
               u_o, v_o, w_o, ru_o, rv_o, rw_o,
               su, sv, sw, ss, sp_, sems):
        k = pl.program_id(0)
        j = pl.program_id(1)
        z0 = k * tz
        y0 = j * ty

        cps = []
        for src, dst, m in ((up_h, su, 0), (vp_h, sv, 1), (wp_h, sw, 2),
                            (sp_h, ss, 3), (pp_h, sp_, 4)):
            c = pltpu.make_async_copy(
                src.at[pl.ds(z0, tz + 2), pl.ds(y0, ty + 2), :],
                dst, sems.at[m])
            c.start()
            cps.append(c)
        for c in cps:
            c.wait()

        f1 = sc[0, 0]
        f2 = sc[0, 1]
        visc = sc[0, 2]
        dxi = sc[0, 3]
        dyi = sc[0, 4]
        f12 = f1 + f2

        dzci = dzci_r[pl.ds(z0, tz + 2), 0]
        dzfi = dzfi_r[pl.ds(z0, tz + 2), 0]

        (eu, exyu, ezu), (ev, exyv, ezv), (ew, exyw, ezw) = st.momentum_rhs(
            su[:], sv[:], sw[:], ss[:], visc, dxi, dyi, dzci, dzfi)
        ru = eu + exyu + ezu
        rv = ev + exyv + ezv
        rw = ew + exyw + ezw

        pp = sp_[:]
        pc = pp[1:-1, 1:-1, 1:-1]
        gpx = dxi * (pp[1:-1, 1:-1, 2:] - pc)
        gpy = dyi * (pp[1:-1, 2:, 1:-1] - pc)
        gpz = dzci[1:-1][:, None, None] * (pp[2:, 1:-1, 1:-1] - pc)

        u_o[:] = su[1:-1, 1:-1, 1:-1] + f1 * ru + f2 * ruo[:] \
            + f12 * (sc[0, 5] - gpx)
        v_o[:] = sv[1:-1, 1:-1, 1:-1] + f1 * rv + f2 * rvo[:] \
            + f12 * (sc[0, 6] - gpy)
        w_o[:] = sw[1:-1, 1:-1, 1:-1] + f1 * rw + f2 * rwo[:] \
            + f12 * (sc[0, 7] - gpz)
        ru_o[:] = ru
        rv_o[:] = rv
        rw_o[:] = rw
    return kernel


def pick_tiles(nz, ny, nxp, itemsize, vmem_budget_mb=100.0):
    """largest (TZ, TY) dividing (nz, ny) whose working set fits VMEM
    (5 halo windows + 9 interior tiles + expression temporaries)."""
    best = None
    for tz in (8, 4, 2):
        if nz % tz:
            continue
        for ty in (128, 64, 32, 16, 8):
            if ny % ty:
                continue
            win = (tz + 2) * (ty + 2) * nxp * itemsize
            out = tz * ty * (nxp - 2) * itemsize
            tot = 5 * win + 9 * out
            # leave ~2/3 of the 16MB core VMEM for Mosaic temporaries
            if tot < 5.5 * 1024 * 1024:
                return tz, ty
    return best


def fused_mom_update(up, vp, wp, sp, ppad, ruo, rvo, rwo, dzci, dzfi,
                     f1, f2, visc, dxi, dyi, bforce, interpret=False):
    """Returns (u_new, v_new, w_new, ru, rv, rw), or None when no valid
    tiling exists (caller falls back to the XLA expression path)."""
    nzp, nyp, nxp = up.shape
    nz, ny, nx = nzp - 2, nyp - 2, nxp - 2
    tiles = pick_tiles(nz, ny, nxp, up.dtype.itemsize)
    if tiles is None:
        return None
    tz, ty = tiles
    grid = (nz // tz, ny // ty)
    dt = up.dtype

    sc = jnp.stack([f1 + 0.0 * f1, f2, jnp.asarray(visc, dt),
                    jnp.asarray(dxi, dt), jnp.asarray(dyi, dt),
                    jnp.asarray(bforce[0], dt), jnp.asarray(bforce[1], dt),
                    jnp.asarray(bforce[2], dt)]).astype(dt).reshape(1, 8)
    dzci_a = jnp.asarray(dzci, dtype=dt).reshape(-1, 1)
    dzfi_a = jnp.asarray(dzfi, dtype=dt).reshape(-1, 1)

    hbm = pltpu.ANY if hasattr(pltpu, 'ANY') else pltpu.HBM
    halo_spec = pl.BlockSpec(memory_space=hbm)
    int_spec = pl.BlockSpec((tz, ty, nx), lambda k, j: (k, j, 0))
    sc_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    z_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    out_shape = [jax.ShapeDtypeStruct((nz, ny, nx), dt)] * 6
    kern = _make_kernel(tz, ty, nxp, nz)
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[sc_spec, z_spec, z_spec] + [halo_spec] * 5 + [int_spec] * 3,
        out_specs=[int_spec] * 6,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((tz + 2, ty + 2, nxp), dt) for _ in range(5)
        ] + [pltpu.SemaphoreType.DMA((5,))],
        interpret=interpret,
    )(sc, dzci_a, dzfi_a, up, vp, wp, sp, ppad, ruo, rvo, rwo)
    return outs
