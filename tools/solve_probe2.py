#!/usr/bin/env python3
"""Variant probe for the Pallas solve kernels (round-3 perf experiment).

tools/solve_bench.py showed the 3-pass Pallas solve (ops/pallas_solve.py)
ties the XLA both_mat solve (~3.4 ms at 512x256x256 f32) while its HBM+MXU
roofline is ~1.7 ms.  This probe times kernel VARIANTS on the real TPU to
locate the waste:

  - strided sublane slicing: the z-eig kernel's `d_ref[:, t, :]` reads one
    sublane from each of nz (ty, nx) tiles (a VMEM transpose in disguise),
    and writes the same way.  Candidate fix: keep the INTERMEDIATE arrays
    in (ky, nz, nx) layout so the z-stage reads/writes contiguous (nz, nx)
    slabs, moving one-sided strided access into the y kernels instead
    (fwd writes transposed, bwd reads transposed).
  - DMA/pipeline floor: a passthrough kernel bounds what the block/grid
    structure itself costs.
  - dot formulation: wide-concat vs per-plane dots vs single-pass bf16.

Timing: one jitted fori_loop per variant with PRE-SCALED operator matrices
(no epilogue scale op -- a pallas_call cannot fuse one; that distorted
solve_bench's D numbers by ~0.33 ms per extra pass).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys
sys.path.insert(0, '.')
from cales_tpu.config import Config
from cales_tpu.grid import make_grid_from_config
from cales_tpu import poisson
from cales_tpu.ops.pallas_kernels import VMEM_BUDGET, _COMPILER_PARAMS, \
    _dot_xop
from cales_tpu.ops.pallas_solve import y_tiles, z_tiles

NZ, NY, NX = 512, 256, 256
NITER = 30


def timeit(fn, x, tag):
    run = jax.jit(lambda p: jax.lax.fori_loop(
        0, NITER, lambda _, q: fn(q), p))
    out = run(x)
    _ = float(jnp.sum(out[(0,) * (out.ndim - 1)][:8]))
    t0 = time.perf_counter()
    out = run(x)
    _ = float(jnp.sum(out[(0,) * (out.ndim - 1)][:8]))
    dt_ms = (time.perf_counter() - t0) * 1e3 / NITER
    print(f"{tag}: {dt_ms:.3f} ms", flush=True)
    return dt_ms


# ---------------------------------------------------------------- Y kernels
def y_variant(M, kind):
    """out = M @ arr per z plane, (nz, ny, nx) -> (nz, ny, nx)."""
    dt = jnp.float32
    tz = y_tiles(NZ, NY, NX, 4)

    def kernel(m_ref, d_ref, o_ref):
        if kind == 'passthrough':
            o_ref[...] = d_ref[...]
            return
        if kind == 'copy':
            wide = jnp.concatenate([d_ref[z] for z in range(tz)], axis=1)
            for z in range(tz):
                o_ref[z] = wide[:, z * NX:(z + 1) * NX]
            return
        if kind == 'perplane':
            for z in range(tz):
                o_ref[z] = _dot_xop(m_ref[...], d_ref[z])
            return
        wide = jnp.concatenate([d_ref[z] for z in range(tz)], axis=1)
        if kind == 'bf16':
            out = jax.lax.dot(m_ref[...].astype(jnp.bfloat16),
                              wide.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
        else:                   # 'wide' == current apply_y
            out = _dot_xop(m_ref[...], wide)
        for z in range(tz):
            o_ref[z] = out[:, z * NX:(z + 1) * NX]

    def run(arr):
        return pl.pallas_call(
            kernel,
            grid=(NZ // tz,),
            in_specs=[pl.BlockSpec((NY, NY), lambda i: (0, 0)),
                      pl.BlockSpec((tz, NY, NX), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((tz, NY, NX), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NZ, NY, NX), dt),
            compiler_params=_COMPILER_PARAMS,
        )(M, arr)
    return run


def y_fwd_T(M):
    """(nz, ny, nx) -> (ny, nz, nx): the wide dot + TRANSPOSED (strided
    sublane) output writes -- the v2 pipeline's forward-y kernel."""
    tz = y_tiles(NZ, NY, NX, 4)

    def kernel(m_ref, d_ref, o_ref):
        wide = jnp.concatenate([d_ref[z] for z in range(tz)], axis=1)
        out = _dot_xop(m_ref[...], wide)
        for z in range(tz):
            o_ref[:, z, :] = out[:, z * NX:(z + 1) * NX]

    def run(arr):
        return pl.pallas_call(
            kernel,
            grid=(NZ // tz,),
            in_specs=[pl.BlockSpec((NY, NY), lambda i: (0, 0)),
                      pl.BlockSpec((tz, NY, NX), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((NY, tz, NX), lambda i: (0, i, 0)),
            out_shape=jax.ShapeDtypeStruct((NY, NZ, NX), jnp.float32),
            compiler_params=_COMPILER_PARAMS,
        )(M, arr)
    return run


def y_bwd_T(M):
    """(ny, nz, nx) -> (nz, ny, nx): strided reads + aligned writes."""
    tz = y_tiles(NZ, NY, NX, 4)

    def kernel(m_ref, d_ref, o_ref):
        wide = jnp.concatenate([d_ref[:, z, :] for z in range(tz)], axis=1)
        out = _dot_xop(m_ref[...], wide)
        for z in range(tz):
            o_ref[z] = out[:, z * NX:(z + 1) * NX]

    def run(arr):
        return pl.pallas_call(
            kernel,
            grid=(NZ // tz,),
            in_specs=[pl.BlockSpec((NY, NY), lambda i: (0, 0)),
                      pl.BlockSpec((NY, tz, NX), lambda i: (0, i, 0))],
            out_specs=pl.BlockSpec((tz, NY, NX), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NZ, NY, NX), jnp.float32),
            compiler_params=_COMPILER_PARAMS,
        )(M, arr)
    return run


# ---------------------------------------------------------------- Z kernels
def z_variant(Vl, Vr, lamz, lamy, lamx, tol, kind):
    """The eigen z stage.  kind:
    'cur'     (nz, ny, nx) layout, strided reads+writes (current)
    'T'       (ny, nz, nx) layout, fully aligned slab reads/writes
    'T_nodiv' 'T' without the eigen-divide (isolate VPU divide cost)
    """
    lamz_c = lamz.reshape(NZ, 1)
    lamx_r = lamx.reshape(1, NX)
    ty, _txn = z_tiles(NZ, NY, NX, 4)   # probe shapes never x-split

    def body(j, wide, ly_ref, vl_ref, vr_ref, lz_ref, lx_ref):
        hat = _dot_xop(vl_ref[...], wide)
        if kind == 'T_nodiv':
            return _dot_xop(vr_ref[...], hat)
        lam_w = jnp.concatenate(
            [lx_ref[...] + ly_ref[j * ty + t] for t in range(ty)], axis=1)
        lam3 = lz_ref[...] + lam_w
        inv = jnp.where(jnp.abs(lam3) > tol, 1.0 / lam3, 0.0)
        return _dot_xop(vr_ref[...], hat * inv)

    if kind == 'cur':
        def kernel(ly_ref, vl_ref, vr_ref, lz_ref, lx_ref, d_ref, o_ref):
            j = pl.program_id(0)
            wide = jnp.concatenate(
                [d_ref[:, t, :] for t in range(ty)], axis=1)
            out = body(j, wide, ly_ref, vl_ref, vr_ref, lz_ref, lx_ref)
            for t in range(ty):
                o_ref[:, t, :] = out[:, t * NX:(t + 1) * NX]
        shape, blk = (NZ, NY, NX), (NZ, ty, NX)
        idx = lambda j: (0, j, 0)
    else:
        def kernel(ly_ref, vl_ref, vr_ref, lz_ref, lx_ref, d_ref, o_ref):
            j = pl.program_id(0)
            wide = jnp.concatenate([d_ref[t] for t in range(ty)], axis=1)
            out = body(j, wide, ly_ref, vl_ref, vr_ref, lz_ref, lx_ref)
            for t in range(ty):
                o_ref[t] = out[:, t * NX:(t + 1) * NX]
        shape, blk = (NY, NZ, NX), (ty, NZ, NX)
        idx = lambda j: (j, 0, 0)

    def run(arr):
        return pl.pallas_call(
            kernel,
            grid=(NY // ty,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((NZ, NZ), lambda j: (0, 0)),
                      pl.BlockSpec((NZ, NZ), lambda j: (0, 0)),
                      pl.BlockSpec((NZ, 1), lambda j: (0, 0)),
                      pl.BlockSpec((1, NX), lambda j: (0, 0)),
                      pl.BlockSpec(blk, idx)],
            out_specs=pl.BlockSpec(blk, idx),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            compiler_params=_COMPILER_PARAMS,
        )(lamy, Vl, Vr, lamz_c, lamx_r, arr)
    return run


def main():
    print('backend:', jax.default_backend(), flush=True)
    cfg = Config(ng=(NX, NY, NZ), l=(12.8, 6.4, 2.0), gtype=1, gr=0.9,
                 visci=25000.0, dtype='float32', ptransform='mat')
    grid = make_grid_from_config(cfg)
    sv = poisson.make_solver(cfg, grid,
                             [cfg.cbc_pre(d) for d in range(3)],
                             ('c', 'c', 'c'))
    f32 = lambda a: jnp.asarray(np.asarray(a), dtype=jnp.float32)
    # pre-scaled mats keep iterated outputs bounded without an epilogue op
    Fs = f32(sv.try_.fwd_mat) * 0.08
    Vl, Vr = f32(sv.zVl), f32(sv.zVr) * 1e-3
    lamz, lamy, lamx = f32(sv.lamz), f32(sv.lamy), f32(sv.lamx)
    scale = float(np.abs(sv.lamz).max() + np.abs(sv.lamx).max()
                  + np.abs(sv.lamy).max())
    tol = float(np.finfo(np.float32).eps * scale * 4.0)

    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal((NZ, NY, NX)).astype(np.float32))
    pT = jnp.swapaxes(p, 0, 1).copy()

    print(f"tz={y_tiles(NZ, NY, NX, 4)} ty={z_tiles(NZ, NY, NX, 4)}",
          flush=True)

    timeit(y_variant(Fs, 'passthrough'), p, 'Y3 passthrough (pipeline floor)')
    timeit(y_variant(Fs, 'copy'), p, 'Y2 concat+split copies, no dot')
    timeit(y_variant(Fs, 'wide'), p, 'Y1 wide bf16x3 dot (current)')
    timeit(y_variant(Fs, 'bf16'), p, 'Y5 wide single-pass bf16 dot')
    timeit(y_variant(Fs, 'perplane'), p, 'Y4 per-plane dots')
    zc = z_variant(Vl, Vr, lamz, lamy, lamx, tol, 'cur')
    zt = z_variant(Vl, Vr, lamz, lamy, lamx, tol, 'T')
    ztn = z_variant(Vl, Vr, lamz, lamy, lamx, tol, 'T_nodiv')
    timeit(zc, p, 'Z1 z-eig current layout (strided r+w)')
    timeit(zt, pT, 'Z2 z-eig (ky,nz,nx) layout (aligned)')
    timeit(ztn, pT, 'Z5 Z2 without eigen-divide')
    yf, yb = y_fwd_T(Fs), y_bwd_T(Fs)
    timeit(lambda q: yb(yf(q)), p, 'Y9+Y10 fwd-T + bwd-T pair')
    y1 = y_variant(Fs, 'wide')
    timeit(lambda q: y1(zc(y1(q))), p, 'V1 full 3-pass, current layouts')
    timeit(lambda q: yb(zt(yf(q))), p, 'V2 full 3-pass, T intermediate')

    # numeric check of the V2 structure against poisson.solve (real mats)
    F = f32(sv.try_.fwd_mat)
    Fi = f32(sv.try_.bwd_mat)
    Vr1 = f32(sv.zVr)
    v2 = jax.jit(lambda q: y_bwd_T(Fi)(
        z_variant(Vl, Vr1, lamz, lamy, lamx, tol, 'T')(y_fwd_T(F)(q))))
    a = poisson.solve(sv, p, pre_xformed_x=True, skip_bwd_x=True)
    b = v2(p)
    a0, b0 = a - jnp.mean(a), b - jnp.mean(b)
    err = float(jnp.max(jnp.abs(b0 - a0)) / jnp.max(jnp.abs(a0)))
    print(f"rel err V2 vs XLA solve: {err:.3e}")


if __name__ == '__main__':
    main()
