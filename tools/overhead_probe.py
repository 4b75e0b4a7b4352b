#!/usr/bin/env python3
"""Separate fixed dispatch/fetch overhead from per-iteration cost.

solve_probe2.py measured a PASSTHROUGH pallas_call at 1.78 "ms/iter" with
NITER=30 — implausible (5.4x the HBM roofline for one pass).  Hypothesis:
the axon tunnel's dispatch+fetch round trip is a large FIXED cost F, and
measured(N) = F/N + c.  Running the same bodies at two N values solves for
both.  This calibrates every solve microbench number (bench.py already
subtracts a 1-step run, so the headline numbers are unaffected).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, '.')
from cales_tpu.config import Config
from cales_tpu.grid import make_grid_from_config
from cales_tpu import poisson

NZ, NY, NX = 512, 256, 256


def timeit(fn, x, niter, tag):
    run = jax.jit(lambda p: jax.lax.fori_loop(
        0, niter, lambda _, q: fn(q), p), static_argnums=())
    out = run(x)
    _ = float(jnp.sum(out[0, 0, :8]))
    t0 = time.perf_counter()
    out = run(x)
    _ = float(jnp.sum(out[0, 0, :8]))
    dt_ms = (time.perf_counter() - t0) * 1e3 / niter
    print(f"{tag} (N={niter}): {dt_ms:.3f} ms/iter", flush=True)
    return dt_ms


def main():
    print('backend:', jax.default_backend(), flush=True)
    cfg = Config(ng=(NX, NY, NZ), l=(12.8, 6.4, 2.0), gtype=1, gr=0.9,
                 visci=25000.0, dtype='float32', ptransform='mat')
    grid = make_grid_from_config(cfg)
    sv = poisson.make_solver(cfg, grid,
                             [cfg.cbc_pre(d) for d in range(3)],
                             ('c', 'c', 'c'))
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal((NZ, NY, NX)).astype(np.float32))

    from tools.solve_probe2 import y_variant, z_variant, y_fwd_T, y_bwd_T
    f32 = lambda a: jnp.asarray(np.asarray(a), dtype=jnp.float32)
    Fs = f32(sv.try_.fwd_mat) * 0.08
    Vl, Vr = f32(sv.zVl), f32(sv.zVr) * 1e-3
    lamz, lamy, lamx = f32(sv.lamz), f32(sv.lamy), f32(sv.lamx)
    scale = float(np.abs(sv.lamz).max() + np.abs(sv.lamx).max()
                  + np.abs(sv.lamy).max())
    tol = float(np.finfo(np.float32).eps * scale * 4.0)

    xla = lambda q: poisson.solve(sv, q, pre_xformed_x=True, skip_bwd_x=True)
    elem = lambda q: q * 1.0000001 + 1e-30          # one elementwise pass
    y3 = y_variant(Fs, 'passthrough')
    y1 = y_variant(Fs, 'wide')
    zc = z_variant(Vl, Vr, lamz, lamy, lamx, tol, 'cur')
    yf, yb = y_fwd_T(Fs), y_bwd_T(Fs)
    zt = z_variant(Vl, Vr, lamz, lamy, lamx, tol, 'T')
    v1 = lambda q: y1(zc(y1(q)))
    v2 = lambda q: yb(zt(yf(q)))

    for niter in (30, 300):
        timeit(elem, p, niter, 'E  one elementwise XLA pass')
        timeit(y3, p, niter, 'Y3 passthrough pallas')
        timeit(y1, p, niter, 'Y1 wide-dot pallas')
        timeit(xla, p, niter, 'A  XLA solve')
        timeit(v1, p, niter, 'V1 pallas 3-pass cur')
        timeit(v2, p, niter, 'V2 pallas 3-pass T')


if __name__ == '__main__':
    main()
