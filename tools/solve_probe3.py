#!/usr/bin/env python3
"""Pallas streaming-pipeline probe (follow-up to overhead_probe.py).

Calibrated numbers (fixed ~32 ms dispatch overhead removed, N=300):
  one XLA elementwise pass     0.41 ms   (~660 GB/s of the 819 peak)
  Pallas passthrough kernel    0.81 ms   (~330 GB/s -- 2x worse!)
  XLA both_mat solve           2.34 ms
  Pallas V1 (current layouts)  2.25 ms
  Pallas V2 (T intermediate)   2.09 ms

The Pallas grid pipeline streams at HALF of what plain XLA fusions reach.
This probe sweeps block height and dimension_semantics to find the knob:
if streaming reaches ~XLA levels, the 3-pass V2 solve drops toward
~1.5 ms (-0.9 ms/substep off the headline).
"""
import functools
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
from cales_tpu.ops.pallas_kernels import VMEM_BUDGET, _dot_xop

NZ, NY, NX = 512, 256, 256
NITER = 300


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


def passthrough(tz, sem):
    cp = pltpu.CompilerParams(
        vmem_limit_bytes=VMEM_BUDGET,
        dimension_semantics=(sem,) if sem else None)

    def kernel(d_ref, o_ref):
        o_ref[...] = d_ref[...]

    def run(arr):
        return pl.pallas_call(
            kernel,
            grid=(NZ // tz,),
            in_specs=[pl.BlockSpec((tz, NY, NX), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((tz, NY, NX), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NZ, NY, NX), jnp.float32),
            compiler_params=cp,
        )(arr)
    return run


def wide_dot(tz, sem):
    cp = pltpu.CompilerParams(
        vmem_limit_bytes=VMEM_BUDGET,
        dimension_semantics=(sem,) if sem else None)

    def kernel(m_ref, d_ref, o_ref):
        wide = jnp.concatenate([d_ref[z] for z in range(tz)], axis=1)
        out = _dot_xop(m_ref[...], wide)
        for z in range(tz):
            o_ref[z] = out[:, z * NX:(z + 1) * NX]

    def run(M, arr):
        return pl.pallas_call(
            kernel,
            grid=(NZ // tz,),
            in_specs=[pl.BlockSpec((NY, NY), lambda i: (0, 0)),
                      pl.BlockSpec((tz, NY, NX), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((tz, NY, NX), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NZ, NY, NX), jnp.float32),
            compiler_params=cp,
        )(M, arr)
    return run


def main():
    print('backend:', jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal((NZ, NY, NX)).astype(np.float32))
    cfg = Config(ng=(NX, NY, NZ), l=(12.8, 6.4, 2.0), gtype=1, gr=0.9,
                 visci=25000.0, dtype='float32', ptransform='mat')
    grid = make_grid_from_config(cfg)
    sv = poisson.make_solver(cfg, grid,
                             [cfg.cbc_pre(d) for d in range(3)],
                             ('c', 'c', 'c'))
    Fs = jnp.asarray(np.asarray(sv.try_.fwd_mat), jnp.float32) * 0.08

    for tz in (4, 8, 16, 32):
        for sem in (None, 'parallel', 'arbitrary'):
            timeit(passthrough(tz, sem), p, f'pass tz={tz} sem={sem}')
    results = []
    for tz in (8, 16, 32):
        for sem in ('parallel', None):
            f = wide_dot(tz, sem)
            dt = timeit(lambda q, f=f: f(Fs, q), p,
                        f'ydot tz={tz} sem={sem}')
            results.append((dt, tz, sem))
    results.sort()
    print('best ydot:', results[0], flush=True)


if __name__ == '__main__':
    main()
