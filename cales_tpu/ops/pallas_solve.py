"""Pallas Poisson-solve kernels: the transform/eigen pipeline in 3 HBM passes.

The XLA both_mat solve (poisson.solve) costs ~6 full-array passes at the
headline shape (swapaxes, fwd-y matmul, two z eigen-matmuls, bwd-y matmul,
swapaxes back — measured 3.2 ms at 512x256x256 f32, tools/solve_bench.py,
and HBM-bound: precomputing the eigen-divide or removing the swaps via
batched dot_generals does NOT help).  These kernels run the same math as
three Pallas passes in the native (z, y, x) layout:

  1. fwd y:   out[z] = Fy @ in[z]            (grid over z blocks)
  2. z stage: out[:, j, :] = Vr @ (inv_j * (Vl @ in[:, j, :]))
              with inv_j = 1/(lamz + lamy[j] + lamx) computed IN-KERNEL
              from the 1D eigenvalue rows (grid over y blocks; both big
              eigen-matmuls + the singular-mode-projected divide fused
              into ONE read+write)
  3. bwd y:   out[z] = Fy^-1 @ in[z]

All dots run at bf16x3 for f32 (pallas_kernels._dot_xop — same error class
as the XLA path's Precision.HIGH) and full precision for f64.  Reference
counterpart: /root/reference/src/solver.f90:20-233 (transform -> batched
tridiagonal -> inverse transform); the eigen z-stage replaces the Thomas
sweep exactly as in poisson._z_eigendecomposition.

Every production pass runs IN PLACE (input_output_aliases) — an unaliased
Pallas r+w pass streams at half bandwidth (tools/solve_probe5/6.py) — and
the z stage is normally the O(nz) in-kernel Thomas sweep (plain or rank-1
periodic) rather than the eigen matmuls.  Both in/out contracts are
served: x-spectral (the kernels' x fusion, pre_xformed_x/skip_bwd_x) or
physical (the x operator rides the y passes as a flat (tz*ny, nx) MXU
dot).  The slab-sharded variant wraps these passes in shard_map around
two explicit all-to-alls (poisson.solve_sharded_pallas).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import VMEM_BUDGET, _COMPILER_PARAMS, _dot_xop


def y_tiles(nz, ny, nx, itemsize, with_x=True):
    """z-block height for the y-transform kernels (no halos; in/out blocks
    are auto-pipelined by Pallas, 2 slots each): 2x2 pipelined blocks +
    wide/out concat copies + bf16 hi/lo splits = ~8 tiles; with_x adds the
    flat x-dot intermediates (+ bf16 splits) and the (nx, nx) x operator
    (~12 tiles).  Eligibility gates call with with_x=True (the worst
    variant) so a gated shape can never exceed vmem_limit_bytes inside
    any apply_y variant; the wrappers pick per-variant."""
    nbuf = 12 if with_x else 8
    for tz in (32, 16, 8, 4, 2, 1):
        if nz % tz:
            continue
        if ((nbuf * tz * ny * nx + 2 * ny * ny
             + (2 * nx * nx if with_x else 0)) * itemsize
                < VMEM_BUDGET - 8 * 1024 * 1024):
            return tz
    return None


def z_tiles(nz, ny, nx, itemsize):
    """(y-block width, x-block width) for the z-stage kernel.  Mosaic
    requires the middle block dim to be a multiple of 8 (or the full ny)
    and the last a multiple of 128; elongated boxes (the north-star
    (512, 64, 1024) per-chip block) additionally need the x dimension
    split to fit VMEM — the sweep is independent per lane, so x blocking
    is free."""
    for ty in (32, 16, 8, 4, 2, 1):
        if ny % ty or (ty % 8 and ty != ny):
            continue
        for txn in (nx, nx // 2, nx // 4, nx // 8):
            if txn <= 0 or txn % 128 or nx % txn:
                continue
            if (10 * ty * nz * txn + 2 * nz * nz) * itemsize \
                    < VMEM_BUDGET - 8 * 1024 * 1024:
                return ty, txn
    return None


def eligible(nz, ny, nx, itemsize):
    return (nx % 128 == 0 and y_tiles(nz, ny, nx, itemsize) is not None
            and z_tiles(nz, ny, nx, itemsize) is not None)


def apply_y(arr, M, alias=False, MxT=None, interpret=False):
    """out[z] = M @ arr[z] (@ MxT) for every z plane: the y-direction
    operator matmul — optionally fused with the x-direction transform —
    in one read+write pass.

    MxT: (nx, nx) TRANSPOSED x operator; the kernel right-dots the whole
    (tz*ny, nx) block flat through the MXU first (one big dot, free dim
    tz*ny), so configs without the kernel-side x fusion still get the full
    x+y transform at ONE pass of HBM traffic.

    alias: run IN PLACE (input_output_aliases) — doubles the streaming
    bandwidth: an unaliased Pallas r+w pass caps at ~330 GB/s vs ~630
    aliased (tools/solve_probe6.py); the non-aliased in+out DMA pair is
    the bottleneck, not slots or operand count (tools/solve_probe5.py)."""
    nz, ny, nx = arr.shape
    assert M.shape == (ny, ny)
    dt = arr.dtype
    has_x = MxT is not None
    tz = y_tiles(nz, ny, nx, dt.itemsize, with_x=has_x)
    assert tz is not None

    def kernel(m_ref, *refs):
        if has_x:
            xm_ref, d_ref, o_ref = refs
            # fused x transform: one flat (tz*ny, nx) @ (nx, nx) dot
            flat = d_ref[...].reshape(tz * ny, nx)
            planes = _dot_xop(flat, xm_ref[...]).reshape(tz, ny, nx)
            wide = jnp.concatenate([planes[z] for z in range(tz)], axis=1)
        else:
            d_ref, o_ref = refs
            # one BIG dot per block: the tz z-planes concatenated along
            # lanes (free dim tz*nx) keep the MXU pipeline full —
            # per-plane (ny, ny) x (ny, nx) dots measured ~5x slower
            wide = jnp.concatenate([d_ref[z] for z in range(tz)], axis=1)
        out = _dot_xop(m_ref[...], wide)
        for z in range(tz):
            o_ref[z] = out[:, z * nx:(z + 1) * nx]

    z_blk = pl.BlockSpec((tz, ny, nx), lambda i: (i, 0, 0))
    xargs = ((jnp.asarray(MxT, dtype=dt),) if has_x else ())
    xspecs = ([pl.BlockSpec((nx, nx), lambda i: (0, 0))] if has_x else [])
    return pl.pallas_call(
        kernel,
        grid=(nz // tz,),
        in_specs=[pl.BlockSpec((ny, ny), lambda i: (0, 0))] + xspecs
                 + [z_blk],
        out_specs=z_blk,
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), dt),
        input_output_aliases={1 + has_x: 0} if alias else {},
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(jnp.asarray(M, dtype=dt), *xargs, arr)


def apply_x(arr, MxT, alias=False, interpret=False):
    """out[z, y, :] = arr[z, y, :] @ MxT: the x-direction operator matmul
    alone, as one aliased read+write pass (one flat (tz*ny, nx) MXU dot
    per block).  Used by the sharded solve, where the x transform must run
    while x is still locally complete (before the y all-to-all)."""
    nz, ny, nx = arr.shape
    dt = arr.dtype
    tz = y_tiles(nz, ny, nx, dt.itemsize, with_x=True)
    assert tz is not None and MxT.shape == (nx, nx)

    def kernel(xm_ref, d_ref, o_ref):
        flat = d_ref[...].reshape(tz * ny, nx)
        o_ref[...] = _dot_xop(flat, xm_ref[...]).reshape(tz, ny, nx)

    blk = pl.BlockSpec((tz, ny, nx), lambda i: (i, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=(nz // tz,),
        in_specs=[pl.BlockSpec((nx, nx), lambda i: (0, 0)), blk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), dt),
        input_output_aliases={1: 0} if alias else {},
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(jnp.asarray(MxT, dtype=dt), arr)


def apply_z_eig(arr, Vl, Vr, lamz, lamy, lamx, tol, alias=False,
                interpret=False):
    """out[:, j, :] = Vr @ (inv_j * (Vl @ arr[:, j, :])) per y row j, with
    inv_j = where(|lamz + lamy[j] + lamx| > tol, 1/lam3, 0) — the
    eigendecomposition z solve plus the singular-constant-mode projection
    of poisson.solve, in one (aliased) read+write pass.  Used for
    periodic z, where the Thomas sweep needs the rank-1 kernel instead."""
    nz, ny, nx = arr.shape
    dt = arr.dtype
    ty, txn = z_tiles(nz, ny, nx, dt.itemsize)
    assert Vl.shape == (nz, nz)
    lamz_c = jnp.asarray(lamz, dtype=dt).reshape(nz, 1)
    lamy_s = jnp.asarray(lamy, dtype=dt)            # (ny,) scalar rows, SMEM
    lamx_r = jnp.asarray(lamx, dtype=dt).reshape(1, nx)
    tol = float(tol)

    def kernel(ly_ref, vl_ref, vr_ref, lz_ref, lx_ref, d_ref, o_ref):
        j = pl.program_id(0)
        # big-dot formulation (see apply_y): ty y-rows side-by-side along
        # lanes -> both eigen-matmuls run with free dim ty*txn
        wide = jnp.concatenate([d_ref[:, t, :] for t in range(ty)],
                               axis=1)
        lam_w = jnp.concatenate(
            [lx_ref[...] + ly_ref[j * ty + t] for t in range(ty)], axis=1)
        hat = _dot_xop(vl_ref[...], wide)
        lam3 = lz_ref[...] + lam_w                  # (nz, ty*txn)
        inv = jnp.where(jnp.abs(lam3) > tol, 1.0 / lam3, 0.0)
        out = _dot_xop(vr_ref[...], hat * inv)
        for t in range(ty):
            o_ref[:, t, :] = out[:, t * txn:(t + 1) * txn]

    blk = pl.BlockSpec((nz, ty, txn), lambda j, i: (0, j, i))
    shape = (nz, ny, nx)
    return pl.pallas_call(
        kernel,
        grid=(ny // ty, nx // txn),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((nz, nz), lambda j, i: (0, 0)),
                  pl.BlockSpec((nz, nz), lambda j, i: (0, 0)),
                  pl.BlockSpec((nz, 1), lambda j, i: (0, 0)),
                  pl.BlockSpec((1, txn), lambda j, i: (0, i)),
                  blk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct(shape, dt),
        input_output_aliases={5: 0} if alias else {},
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(lamy_s, jnp.asarray(Vl, dtype=dt), jnp.asarray(Vr, dtype=dt),
      lamz_c, lamx_r, arr)


def thomas_z_tiles(nz, ny, nx, itemsize):
    """y-block width for the in-kernel Thomas z-stage (V1 layout): 2x2
    pipelined in/out blocks + factor scratch.  Budgeted for the WORST
    variant (the rank-1 periodic kernel's TWO (nz, ty, nx) scratch
    buffers = 6 tiles), so the eligibility gate covers every caller."""
    for ty in (16, 8):
        if ny % ty:
            continue
        for txn in (nx, nx // 2, nx // 4, nx // 8):
            if txn <= 0 or txn % 128 or nx % txn:
                continue
            if (6 * ty * nz * txn * itemsize
                    < VMEM_BUDGET - 8 * 1024 * 1024):
                return ty, txn
    return None


def apply_thomas_z(arr, a, b, c, lamy, lamx, pin_singular, tol,
                   interpret=False, n_solve=None):
    """See _apply_thomas_z; lamy/lamx variant (the Poisson z stage)."""
    return _apply_thomas_z(arr, a, b, c, lamy, lamx, pin_singular, tol,
                           interpret, n_solve=n_solve)


def apply_thomas_helmholtz_z(arr, a, b, c, interpret=False, shift=None,
                             n_solve=None, bc_lo=None, bc_hi=None):
    """In-place tridiag(a, b, c) solve along z with NO diagonal shift —
    the z-only Crank–Nicolson Helmholtz solve (I + alpha*Lz) of the
    _IMPDIFF_1D path (solver_gaussel_z, solver.f90:182-233), with the
    caller passing the pre-scaled (a*alpha, b*alpha+1, c*alpha) rows.
    One aliased read+write pass per velocity component instead of the two
    (nz, nz) eigen matmul passes of solve_z_only's eig branch.

    n_solve: rows solved; rows n_solve..nz-1 pass through in-kernel (the
    face-staggered Dirichlet tail — saves the full-field slice+concat the
    host-side tail costs).  bc_lo/bc_hi: (ny, nx) RHS boundary planes
    (updt_rhs_b, bound.f90:562-617) added to rows 0 / n_solve-1
    in-register — saves the host-side dynamic-update-slice adds."""
    return _apply_thomas_z(arr, a, b, c, None, None, False, 0.0, interpret,
                           shift=shift, n_solve=n_solve,
                           bc_lo=bc_lo, bc_hi=bc_hi)


def apply_thomas_periodic_z(arr, a, b, c, lamy, lamx, pin_singular, tol,
                            interpret=False):
    """In-place PERIODIC tridiagonal solve along z — the rank-1-corrected
    two-RHS Thomas sweep of ops/tridiag.thomas_periodic (the reference
    gaussel_periodic, solver.f90:109-151), fused into one aliased Pallas
    pass for the triperiodic class.

    The reduced (nz-1)-row system is factorized once; the data RHS p1 and
    the correction RHS e (e[0] = -a[0], e[nz-2] = -c[nz-2]) share the
    forward sweep, both back-substitute in VMEM, then
      pn  = (r[nz-1] - c[nz-1] p1[0] - a[nz-1] p1[nz-2]) / den,
      den = (b[nz-1] + lam) + c[nz-1] p2[0] + a[nz-1] p2[nz-2],
      out = p1 + p2 * pn,  out[nz-1] = pn.
    pin_singular: lanes with |lamy+lamx| <= tol (the all-periodic constant
    mode) get pn pinned to 0 — the same gauge-fixing as apply_thomas_z.
    """
    nz, ny, nx = arr.shape
    n = nz - 1
    dt = arr.dtype
    ty, txn = thomas_z_tiles(nz, ny, nx, dt.itemsize)
    assert n >= 2
    a_s = jnp.asarray(a, dtype=dt)
    b_s = jnp.asarray(b, dtype=dt)
    c_s = jnp.asarray(c, dtype=dt)
    lamy_s = jnp.asarray(lamy, dtype=dt)
    lamx_r = jnp.asarray(lamx, dtype=dt).reshape(1, nx)
    pin = bool(pin_singular)
    tol = float(tol)

    def kernel(a_ref, b_ref, c_ref, ly_ref, lx_ref, d_ref, o_ref,
               w_ref, q_ref):
        j = pl.program_id(0)
        rows = [lx_ref[...] + ly_ref[j * ty + t] for t in range(ty)]
        lam = jnp.concatenate(rows, axis=0)

        # forward sweep over the reduced n rows, two RHS sharing zfac
        zfac0 = 1.0 / (b_ref[0] + lam)
        d_0 = c_ref[0] * zfac0
        w_ref[0] = d_0
        p1_0 = d_ref[0] * zfac0
        o_ref[0] = p1_0
        p2_0 = -a_ref[0] * zfac0
        q_ref[0] = p2_0

        def fwd(z, carry):
            d_prev, p1_prev, p2_prev = carry
            az, bz, cz = a_ref[z], b_ref[z], c_ref[z]
            zfac = 1.0 / (bz + lam - az * d_prev)
            d_k = cz * zfac
            e_k = jnp.where(z == n - 1, -c_ref[n - 1], 0.0)
            p1_k = (d_ref[z] - az * p1_prev) * zfac
            p2_k = (e_k - az * p2_prev) * zfac
            w_ref[z] = d_k
            o_ref[z] = p1_k
            q_ref[z] = p2_k
            return d_k, p1_k, p2_k

        jax.lax.fori_loop(1, n, fwd, (d_0, p1_0, p2_0))

        def bwd(i, carry):
            p1n, p2n = carry
            z = n - 2 - i
            dk = w_ref[z]
            p1 = o_ref[z] - dk * p1n
            p2 = q_ref[z] - dk * p2n
            o_ref[z] = p1
            q_ref[z] = p2
            return p1, p2

        jax.lax.fori_loop(0, n - 1, bwd, (o_ref[n - 1], q_ref[n - 1]))

        cn, an, bn = c_ref[n], a_ref[n], b_ref[n]
        num = d_ref[n] - cn * o_ref[0] - an * o_ref[n - 1]
        den = (bn + lam) + cn * q_ref[0] + an * q_ref[n - 1]
        pn = num / den
        if pin:
            pn = jnp.where(jnp.abs(lam) <= tol, 0.0, pn)

        def combine(z, _):
            o_ref[z] = o_ref[z] + q_ref[z] * pn
            return 0

        jax.lax.fori_loop(0, n, combine, 0)
        o_ref[n] = pn

    blk = pl.BlockSpec((nz, ty, txn), lambda j, i: (0, j, i))
    return pl.pallas_call(
        kernel,
        grid=(ny // ty, nx // txn),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, txn), lambda j, i: (0, i)),
                  blk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), dt),
        scratch_shapes=[pltpu.VMEM((nz, ty, txn), dt),
                        pltpu.VMEM((nz, ty, txn), dt)],
        input_output_aliases={5: 0},
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(a_s, b_s, c_s, lamy_s, lamx_r, arr)


def _apply_thomas_z(arr, a, b, c, lamy, lamx, pin_singular, tol,
                    interpret=False, n_solve=None, shift=None,
                    bc_lo=None, bc_hi=None):
    """In-place tridiag(a, b + lamy[j] + lamx, c) solve along z — the
    direct O(nz) replacement for the z-eig stage's two (nz, nz) bf16x3
    matmuls, for non-periodic z.

    Same sweep structure as ops/tridiag.thomas (the reference
    dgtsv_homebrewed, solver.f90:153-179): the forward sweep writes the
    intermediate solution into the (aliased) output block and the c*zfac
    factors into VMEM scratch; the backward sweep rewrites the output in
    place.  Runs in the native (nz, ny, nx) layout, where z is the
    UNTILED leading block dim: each sweep step indexes a cheap (ty, nx)
    slab and the whole pass streams at the aliased full rate.

    pin_singular (z all-Neumann): lanes with |lamy+lamx| <= tol carry the
    exactly singular constant mode.  Instead of the reference's
    eps-regularized pivot (which amplifies any RHS inconsistency by
    1/pivot), those lanes get their FIRST pivot reciprocal zeroed — i.e.
    p[0] is pinned to 0 and row 0 dropped, which leaves a well-conditioned
    reduced system and fixes the pressure gauge, matching the eig path's
    tol-projection semantics up to a constant.
    """
    nz, ny, nx = arr.shape
    ns = nz if n_solve is None else int(n_solve)   # rows solved; rows
    assert 2 <= ns <= nz                           # ns..nz-1 pass through
    dt = arr.dtype
    ty, txn = thomas_z_tiles(nz, ny, nx, dt.itemsize)
    a_s = jnp.asarray(a, dtype=dt)[:ns]
    b_s = jnp.asarray(b, dtype=dt)[:ns]
    c_s = jnp.asarray(c, dtype=dt)[:ns]
    has_lam = lamy is not None
    if has_lam:
        lam_args = (jnp.asarray(lamy, dtype=dt),
                    jnp.asarray(lamx, dtype=dt).reshape(1, nx))
        lam_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                     pl.BlockSpec((1, txn), lambda j, i: (0, i))]
    else:
        lam_args, lam_specs = (), []
    pin = bool(pin_singular)
    tol = float(tol)
    # traced constant RHS shift (the folded bulk-forcing add of the CN
    # Helmholtz path: solving rhs+f == adding f to the field pre-solve)
    has_shift = shift is not None
    shift_args = ((jnp.full((1, 1), 1.0, dt) * shift,) if has_shift else ())
    shift_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)]
                   if has_shift else [])
    has_bc = bc_lo is not None
    assert has_bc == (bc_hi is not None)
    bc_args = ((jnp.asarray(bc_lo, dt), jnp.asarray(bc_hi, dt))
               if has_bc else ())
    bc_specs = ([pl.BlockSpec((ty, txn), lambda j, i: (j, i))] * 2
                if has_bc else [])

    def kernel(a_ref, b_ref, c_ref, *refs):
        refs = list(refs)
        sh_ref = refs.pop(0) if has_shift else None
        blo_ref = refs.pop(0) if has_bc else None
        bhi_ref = refs.pop(0) if has_bc else None
        if has_lam:
            ly_ref, lx_ref, d_ref, o_ref, w_ref = refs
            j = pl.program_id(0)
            # (ty, nx) diagonal-shift tile: lamx row + per-row lamy scalars
            rows = [lx_ref[...] + ly_ref[j * ty + t] for t in range(ty)]
            lam = jnp.concatenate(rows, axis=0)
        else:
            d_ref, o_ref, w_ref = refs
            lam = jnp.zeros((ty, txn), dt)
        sh = sh_ref[0, 0] if has_shift else 0.0

        # peeled z=0 step: pin the singular lanes' gauge here
        zfac0 = 1.0 / (b_ref[0] + lam)
        if pin:
            zfac0 = jnp.where(jnp.abs(lam) <= tol, 0.0, zfac0)
        d_0 = c_ref[0] * zfac0
        w_ref[0] = d_0
        rhs_0 = d_ref[0] + sh if has_shift else d_ref[0]
        if has_bc:
            rhs_0 = rhs_0 + blo_ref[...]
        p_0 = rhs_0 * zfac0
        o_ref[0] = p_0

        def fwd(z, carry):
            d_prev, p_prev = carry
            az, bz, cz = a_ref[z], b_ref[z], c_ref[z]
            zfac = 1.0 / (bz + lam - az * d_prev)
            d_k = cz * zfac
            rhs_z = d_ref[z] + sh if has_shift else d_ref[z]
            if has_bc:
                rhs_z = rhs_z + jnp.where(z == ns - 1, 1.0, 0.0) \
                    * bhi_ref[...]
            p_k = (rhs_z - az * p_prev) * zfac
            w_ref[z] = d_k
            o_ref[z] = p_k
            return d_k, p_k

        jax.lax.fori_loop(1, ns, fwd, (d_0, p_0))

        def bwd(i, p_next):
            z = ns - 2 - i
            p_new = o_ref[z] - w_ref[z] * p_next
            o_ref[z] = p_new
            return p_new

        jax.lax.fori_loop(0, ns - 1, bwd, o_ref[ns - 1])

        # qz passthrough rows (face-staggered Dirichlet tail): explicit
        # copy (+ the shift, which the caller applies to the whole field)
        for z in range(ns, nz):
            o_ref[z] = d_ref[z] + sh if has_shift else d_ref[z]

    blk = pl.BlockSpec((nz, ty, txn), lambda j, i: (0, j, i))
    return pl.pallas_call(
        kernel,
        grid=(ny // ty, nx // txn),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)]
                 + shift_specs + bc_specs + lam_specs + [blk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), dt),
        scratch_shapes=[pltpu.VMEM((nz, ty, txn), dt)],
        input_output_aliases={3 + has_shift + 2 * has_bc
                              + len(lam_specs): 0},
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(a_s, b_s, c_s, *shift_args, *bc_args, *lam_args, arr)
