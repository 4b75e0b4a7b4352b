#!/usr/bin/env python3
"""Aliased 3-pass solve probe: in-place (input_output_aliases) passes +
an in-kernel Thomas z-stage.

probe6 found input_output_aliases={0:0} doubles Pallas streaming bandwidth
(0.83 -> 0.41 ms/pass).  Aliasing needs identical in/out shapes, so the V1
(nz, ny, nx) layout (all 3 passes same shape) wins back its advantage over
the V2 transposed pipeline.  And with z as the UNTILED leading dim of each
(nz, ty, nx) block, a sequential Thomas sweep indexes cheap (ty, nx) slabs
-> replace the z-eig stage's two (nz, nz) matmuls (~1.0 ms of bf16x3 MXU
work) with an O(nz) in-VMEM sweep.

Variants timed (512x256x256 f32):
  A  aliased Y pass (V1 wide-dot)             expect ~0.45
  B  aliased z-eig, V1 layout                 MXU-bound?
  C  aliased z-Thomas kernel                  expect ~0.45-0.6
  D  full: Y(al) -> z-eig(al) -> Y(al)
  E  full: Y(al) -> Thomas(al) -> Y(al)
plus numerics: E vs poisson.solve (mean-subtracted) on the channel config.
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

NZ, NY, NX = 512, 256, 256
NITER = 100
_CP = pltpu.CompilerParams(vmem_limit_bytes=VMEM_BUDGET)


def timeit(fn, x, tag):
    run = jax.jit(lambda p: jax.lax.fori_loop(
        0, NITER, lambda _, q: fn(q), p))
    out = run(x)
    _ = float(jnp.sum(out[0, 0, :8]))
    t0 = time.perf_counter()
    out = run(x)
    _ = float(jnp.sum(out[0, 0, :8]))
    dt_ms = (time.perf_counter() - t0) * 1e3 / NITER - 32.0 / NITER
    print(f"{tag}: {dt_ms:.3f} ms", flush=True)
    return dt_ms


def y_alias(M, tz=8):
    def kernel(m_ref, d_ref, o_ref):
        wide = jnp.concatenate([d_ref[z] for z in range(tz)], axis=1)
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
            out_shape=jax.ShapeDtypeStruct((NZ, NY, NX), jnp.float32),
            input_output_aliases={1: 0},
            compiler_params=_CP,
        )(M, arr)
    return run


def zeig_alias(Vl, Vr, lamz, lamy, lamx, tol, ty=8):
    lamz_c = lamz.reshape(NZ, 1)
    lamx_r = lamx.reshape(1, NX)

    def kernel(ly_ref, vl_ref, vr_ref, lz_ref, lx_ref, d_ref, o_ref):
        j = pl.program_id(0)
        wide = jnp.concatenate([d_ref[:, t, :] for t in range(ty)], axis=1)
        lam_w = jnp.concatenate(
            [lx_ref[...] + ly_ref[j * ty + t] for t in range(ty)], axis=1)
        hat = _dot_xop(vl_ref[...], wide)
        lam3 = lz_ref[...] + lam_w
        inv = jnp.where(jnp.abs(lam3) > tol, 1.0 / lam3, 0.0)
        out = _dot_xop(vr_ref[...], hat * inv)
        for t in range(ty):
            o_ref[:, t, :] = out[:, t * NX:(t + 1) * NX]

    def run(arr):
        return pl.pallas_call(
            kernel,
            grid=(NY // ty,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((NZ, NZ), lambda j: (0, 0)),
                      pl.BlockSpec((NZ, NZ), lambda j: (0, 0)),
                      pl.BlockSpec((NZ, 1), lambda j: (0, 0)),
                      pl.BlockSpec((1, NX), lambda j: (0, 0)),
                      pl.BlockSpec((NZ, ty, NX), lambda j: (0, j, 0))],
            out_specs=pl.BlockSpec((NZ, ty, NX), lambda j: (0, j, 0)),
            out_shape=jax.ShapeDtypeStruct((NZ, NY, NX), jnp.float32),
            input_output_aliases={5: 0},
            compiler_params=_CP,
        )(lamy, Vl, Vr, lamz_c, lamx_r, arr)
    return run


def thomas_alias(a, b, c, lamy, lamx, ty=8):
    """tridiag(a, b + lamy[j] + lamx, c) solve along z, in place.

    Identical math to ops/tridiag.thomas (eps-regularized pivots, the
    reference dgtsv_homebrewed, solver.f90:153-179) but as one aliased
    Pallas pass: fwd sweep writes p into the output block and the c*z
    factors into VMEM scratch, bwd sweep rewrites the output in place.
    """
    eps = float(np.finfo(np.float32).eps)
    lamx_r = lamx.reshape(1, NX)

    def kernel(a_ref, b_ref, c_ref, ly_ref, lx_ref, d_ref, o_ref, w_ref):
        j = pl.program_id(0)
        # (ty, nx) lam tile: lamx row + per-row lamy scalars (diag is
        # b[z] + lamy[j]+lamx, same convention as poisson.solve)
        rows = [lx_ref[...] + ly_ref[j * ty + t] for t in range(ty)]
        lam = jnp.concatenate(rows, axis=0)                 # (ty, nx)

        def fwd(z, carry):
            d_prev, p_prev = carry
            az, bz, cz = a_ref[z], b_ref[z], c_ref[z]
            zfac = 1.0 / (bz + lam - az * d_prev + eps)
            d_k = cz * zfac
            p_k = (d_ref[z] - az * p_prev) * zfac
            w_ref[z] = d_k
            o_ref[z] = p_k
            return d_k, p_k

        z0 = jnp.zeros((ty, NX), jnp.float32)
        jax.lax.fori_loop(0, NZ, fwd, (z0, z0))

        def bwd(i, p_next):
            z = NZ - 2 - i
            p_new = o_ref[z] - w_ref[z] * p_next
            o_ref[z] = p_new
            return p_new

        jax.lax.fori_loop(0, NZ - 1, bwd, o_ref[NZ - 1])

    def run(arr):
        return pl.pallas_call(
            kernel,
            grid=(NY // ty,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((1, NX), lambda j: (0, 0)),
                      pl.BlockSpec((NZ, ty, NX), lambda j: (0, j, 0))],
            out_specs=pl.BlockSpec((NZ, ty, NX), lambda j: (0, j, 0)),
            out_shape=jax.ShapeDtypeStruct((NZ, NY, NX), jnp.float32),
            scratch_shapes=[pltpu.VMEM((NZ, ty, NX), jnp.float32)],
            input_output_aliases={5: 0},
            compiler_params=_CP,
        )(a, b, c, lamy, lamx_r, arr)
    return run


def main():
    print('backend:', jax.default_backend(), flush=True)
    cfg = Config(ng=(NX, NY, NZ), l=(12.8, 6.4, 2.0), gtype=1, gr=0.9,
                 visci=25000.0, dtype='float32', ptransform='mat')
    grid = make_grid_from_config(cfg)
    sv = poisson.make_solver(cfg, grid,
                             [cfg.cbc_pre(d) for d in range(3)],
                             ('c', 'c', 'c'))
    f32 = lambda x: jnp.asarray(np.asarray(x), dtype=jnp.float32)
    Fs = f32(sv.try_.fwd_mat) * 0.08
    Vl, Vr = f32(sv.zVl), f32(sv.zVr) * 1e-3
    lamz, lamy, lamx = f32(sv.lamz), f32(sv.lamy), f32(sv.lamx)
    a, b, c = f32(sv.a), f32(sv.b), f32(sv.c)
    scale = float(np.abs(sv.lamz).max() + np.abs(sv.lamx).max()
                  + np.abs(sv.lamy).max())
    tol = float(np.finfo(np.float32).eps * scale * 4.0)

    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal((NZ, NY, NX)).astype(np.float32))

    ya = y_alias(Fs)
    za = zeig_alias(Vl, Vr, lamz, lamy, lamx, tol)
    # NEGATED lam for thomas: tridmatrix solves (a,b,c) + lamxy with the
    # sign convention of poisson.solve (lam added to diag b)
    th = thomas_alias(a, b, c, lamy, lamx)
    timeit(ya, p, 'A aliased Y pass')
    timeit(za, p, 'B aliased z-eig (V1 layout)')
    timeit(th, p, 'C aliased z-Thomas')
    timeit(lambda q: ya(za(ya(q))), p, 'D full aliased eig pipeline')
    timeit(lambda q: ya(th(ya(q))), p, 'E full aliased thomas pipeline')

    # ---- numerics: real-matrix pipeline vs poisson.solve
    F, Fi = f32(sv.try_.fwd_mat), f32(sv.try_.bwd_mat)
    yf, yb = y_alias(F), y_alias(Fi)
    full = jax.jit(lambda q: yb(thomas_alias(a, b, c, lamy, lamx)(yf(q))))
    ref = jax.jit(lambda q: poisson.solve(sv, q, pre_xformed_x=True,
                                          skip_bwd_x=True))
    pa = full(p)
    pb = ref(p)
    pa = pa - jnp.mean(pa)
    pb = pb - jnp.mean(pb)
    err = float(jnp.max(jnp.abs(pa - pb)) / jnp.max(jnp.abs(pb)))
    print(f"rel err thomas-pipeline vs XLA eig solve: {err:.3e}")


if __name__ == '__main__':
    main()
