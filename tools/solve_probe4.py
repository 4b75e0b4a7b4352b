#!/usr/bin/env python3
"""DMA-concurrency probe: does pallas_call streaming bandwidth scale with
the number of operands?

probe3 pinned a single-operand pallas pass at ~0.81 ms (330 GB/s) for any
block height / dimension_semantics, while an XLA elementwise pass runs
0.41 ms (660 GB/s) and the repo's multi-stream momentum kernels beat that.
If per-buffer DMA issue is the limiter, splitting the field into k operand
pairs (k concurrent in-DMAs + k out-DMAs per grid slot) should approach
the XLA number — which would put a 3-pass Pallas solve at ~1.4 ms vs the
XLA solve's 2.34.
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
from cales_tpu.ops.pallas_kernels import VMEM_BUDGET, _dot_xop

NZ, NY, NX = 512, 256, 256
NITER = 300
_CP = pltpu.CompilerParams(vmem_limit_bytes=VMEM_BUDGET)


def timeit(fn, xs, tag):
    run = jax.jit(lambda ps: jax.lax.fori_loop(
        0, NITER, lambda _, qs: fn(*qs), ps))
    out = run(xs)
    _ = float(jnp.sum(out[0][0, 0, :8]))
    t0 = time.perf_counter()
    out = run(xs)
    _ = float(jnp.sum(out[0][0, 0, :8]))
    dt_ms = (time.perf_counter() - t0) * 1e3 / NITER - 32.0 / NITER
    print(f"{tag}: {dt_ms:.3f} ms", flush=True)
    return dt_ms


def split_pass(k, tz, dot_mat=None):
    """k-operand passthrough (or y-dot) over (NZ/k, NY, NX) pieces."""
    nzk = NZ // k

    def kernel(*refs):
        if dot_mat is not None:
            m_ref, refs = refs[0], refs[1:]
        ins, outs = refs[:k], refs[k:]
        for a, b in zip(ins, outs):
            if dot_mat is None:
                b[...] = a[...]
            else:
                wide = jnp.concatenate([a[z] for z in range(tz)], axis=1)
                o = _dot_xop(m_ref[...], wide)
                for z in range(tz):
                    b[z] = o[:, z * NX:(z + 1) * NX]

    spec = pl.BlockSpec((tz, NY, NX), lambda i: (i, 0, 0))
    in_specs = [spec] * k
    if dot_mat is not None:
        in_specs = [pl.BlockSpec((NY, NY), lambda i: (0, 0))] + in_specs

    def run(*arrs):
        args = arrs if dot_mat is None else (dot_mat,) + arrs
        return pl.pallas_call(
            kernel,
            grid=(nzk // tz,),
            in_specs=in_specs,
            out_specs=[spec] * k,
            out_shape=[jax.ShapeDtypeStruct((nzk, NY, NX), jnp.float32)] * k,
            compiler_params=_CP,
        )(*args)
    return run


def main():
    print('backend:', jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    cfg = Config(ng=(NX, NY, NZ), l=(12.8, 6.4, 2.0), gtype=1, gr=0.9,
                 visci=25000.0, dtype='float32', ptransform='mat')
    grid = make_grid_from_config(cfg)
    sv = poisson.make_solver(cfg, grid,
                             [cfg.cbc_pre(d) for d in range(3)],
                             ('c', 'c', 'c'))
    Fs = jnp.asarray(np.asarray(sv.try_.fwd_mat), jnp.float32) * 0.08

    for k in (1, 2, 4, 8):
        xs = tuple(jnp.asarray(
            rng.standard_normal((NZ // k, NY, NX)).astype(np.float32))
            for _ in range(k))
        timeit(split_pass(k, tz=8), xs, f'pass k={k} tz=8')
    for k in (2, 4):
        xs = tuple(jnp.asarray(
            rng.standard_normal((NZ // k, NY, NX)).astype(np.float32))
            for _ in range(k))
        timeit(split_pass(k, tz=8, dot_mat=Fs), xs, f'ydot k={k} tz=8')


if __name__ == '__main__':
    main()
