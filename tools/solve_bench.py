#!/usr/bin/env python3
"""Microbenchmark of Poisson-solve variants on the real TPU.

Round-3 perf experiment: the solve is ~35% of the headline substep
(BENCH_MATRIX.json).  Candidate levers, measured here at the production
channel shape/BCs ((z,y,x) = (512, 256, 256) f32, PP/PP/NN, all-matmul
transforms, x stages fused into the momentum/corrector kernels i.e.
pre_xformed_x + skip_bwd_x):

  A  current poisson.solve (swapaxes y stages + in-trace eigen-divide)
  B  A + the eigen-divide denominator 1/(lamz+lamxy) precomputed ONCE on
     device and passed as an argument (removes a full-array add+divide+
     select per solve; the array cannot be a closure — it would inline
     as a 134 MB HLO literal)
  C  B + y stages as broadcast-batch dot_generals in the native (z,y,x)
     layout (batch dim z), removing BOTH swapaxes relayout passes

Timing per CLAUDE.md: one jitted fori_loop of NITER solves, synced by
fetching a scalar.
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from cales_tpu.config import Config
from cales_tpu.grid import make_grid_from_config
from cales_tpu import poisson
from cales_tpu.ops import transforms as tr


def build(nz, ny, nx):
    # Config defaults are the channel BCs (PP/PP + z walls, pressure NN)
    cfg = Config(ng=(nx, ny, nz), l=(12.8, 6.4, 2.0), gtype=1, gr=0.9,
                 visci=25000.0, dtype='float32', ptransform='mat')
    grid = make_grid_from_config(cfg)
    sv = poisson.make_solver(cfg, grid, [cfg.cbc_pre(d) for d in range(3)],
                             ('c', 'c', 'c'))
    return cfg, grid, sv


def precompute_inv(sv, dtype):
    """1/(lamz + lamx + lamy) with the singular constant mode projected out,
    in the (z, kx, ky) spectral layout of the both_mat path."""
    lam3 = (np.asarray(sv.lamz)[:, None, None]
            + np.asarray(sv.lamx)[None, :, None]
            + np.asarray(sv.lamy)[None, None, :])
    scale = (np.abs(sv.lamz).max() + np.abs(sv.lamx).max()
             + np.abs(sv.lamy).max())
    tol = np.finfo(np.dtype(dtype)).eps * scale * 4.0
    inv = np.where(np.abs(lam3) > tol, 1.0 / np.where(lam3 == 0, 1.0, lam3),
                   0.0)
    return jnp.asarray(inv.astype(dtype))


def solve_B(sv, p, inv):
    """Variant B: current layout, precomputed inv arg."""
    nz, ny, nx = p.shape
    prec = jax.lax.Precision.HIGH
    body = jnp.swapaxes(p, 1, 2)                     # (z, x, y)
    body = tr.fwd(sv.try_, body, axis=-1)
    Vl = jnp.asarray(sv.zVl, dtype=p.dtype)
    Vr = jnp.asarray(sv.zVr, dtype=p.dtype)
    hat = jnp.tensordot(Vl, body, axes=(1, 0), precision=prec)
    hat = hat * inv
    body = jnp.tensordot(Vr, hat, axes=(1, 0), precision=prec)
    body = tr.bwd(sv.try_, body, axis=-1, n=ny, real_out=True)
    return jnp.swapaxes(body, 1, 2)


def solve_C(sv, p, inv_zyx):
    """Variant C: y stages as broadcast-batch dot_generals in (z,y,x)
    layout — no swapaxes; inv in (z, ky, kx) layout."""
    nz, ny, nx = p.shape
    dt = p.dtype
    prec = jax.lax.Precision.HIGH
    F = jnp.asarray(sv.try_.fwd_mat, dtype=dt)       # (ky, y)
    Fi = jnp.asarray(sv.try_.bwd_mat, dtype=dt)      # (y, ky)
    Vl = jnp.asarray(sv.zVl, dtype=dt)
    Vr = jnp.asarray(sv.zVr, dtype=dt)

    def bmm(M, B):
        # (z, k, y) x (z, y, x) -> (z, k, x); the broadcast of M over z
        # fuses into the dot (no materialized copies)
        Mb = jnp.broadcast_to(M, (B.shape[0],) + M.shape)
        return jax.lax.dot_general(Mb, B, (((2,), (1,)), ((0,), (0,))),
                                   precision=prec)

    body = bmm(F, p)                                  # (z, ky, x)
    hat = jnp.tensordot(Vl, body, axes=(1, 0), precision=prec)
    hat = hat * inv_zyx
    body = jnp.tensordot(Vr, hat, axes=(1, 0), precision=prec)
    return bmm(Fi, body)                              # (z, y, x)


def timeit(fn, p, niter, tag, *extra):
    @jax.jit
    def run(p0, *ex):
        def body(_, q):
            return fn(q, *ex) * 1e-6
        return jax.lax.fori_loop(0, niter, body, p0)

    out = run(p, *extra)
    _ = float(jnp.sum(out[0, 0, :8]))                 # sync (compile+warm)
    t0 = time.perf_counter()
    out = run(p, *extra)
    _ = float(jnp.sum(out[0, 0, :8]))
    dt_ms = (time.perf_counter() - t0) * 1e3 / niter
    print(f"{tag}: {dt_ms:.3f} ms/solve")
    return dt_ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--shape', default='512,256,256')
    ap.add_argument('--niter', type=int, default=30)
    args = ap.parse_args()
    nz, ny, nx = map(int, args.shape.split(','))
    cfg, grid, sv = build(nz, ny, nx)
    print('backend:', jax.default_backend())

    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal((nz, ny, nx)).astype(np.float32))

    # precompute_inv returns (z, kx, ky) — the both_mat spectral layout
    # (variant B); variant C works in (z, ky, kx)
    inv_zxy = precompute_inv(sv, np.float32)
    inv_zyx = jnp.swapaxes(inv_zxy, 1, 2).copy()

    timeit(lambda q: poisson.solve(sv, q, pre_xformed_x=True,
                                   skip_bwd_x=True),
           p, args.niter, 'A  current solve (x-fused ends)')
    timeit(lambda q, iv: solve_B(sv, q, iv), p, args.niter,
           'B  precomputed inv', inv_zxy)
    timeit(lambda q, iv: solve_C(sv, q, iv), p, args.niter,
           'C  batch-dot y stages, no swaps', inv_zyx)
    if poisson.pallas_eligible(sv, p.shape, 4):
        timeit(lambda q: poisson.solve(sv, q, pre_xformed_x=True,
                                       skip_bwd_x=True, pallas=True),
               p, args.niter, 'D  Pallas 3-pass solve')
        from cales_tpu.ops import pallas_solve as ps
        timeit(lambda q: ps.apply_y(q, sv.try_.fwd_mat) * 1e-3,
               p, args.niter, 'D1 pallas fwd-y kernel alone')
        scale = float(np.abs(sv.lamz).max() + np.abs(sv.lamx).max()
                      + np.abs(sv.lamy).max())
        tol = np.finfo(np.float32).eps * scale * 4.0
        timeit(lambda q: ps.apply_z_eig(q, sv.zVl, sv.zVr, sv.lamz,
                                        sv.lamy, sv.lamx, tol) * 1e-3,
               p, args.niter, 'D2 pallas z-eig kernel alone')

    # numeric check: B and C agree with A
    a = poisson.solve(sv, p, pre_xformed_x=True, skip_bwd_x=True)
    b = solve_B(sv, p, inv_zxy)
    c = solve_C(sv, p, inv_zyx)
    checks = [('B', b), ('C', c)]
    if poisson.pallas_eligible(sv, p.shape, 4):
        checks.append(('D', poisson.solve(sv, p, pre_xformed_x=True,
                                          skip_bwd_x=True, pallas=True)))
    a0 = a - jnp.mean(a)
    for tag, x in checks:
        x0 = x - jnp.mean(x)
        err = float(jnp.max(jnp.abs(x0 - a0)) / jnp.max(jnp.abs(a0)))
        print(f"rel err {tag} vs A: {err:.3e}")


if __name__ == '__main__':
    main()
