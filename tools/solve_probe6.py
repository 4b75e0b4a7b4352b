#!/usr/bin/env python3
"""Aliasing probe: does in-place (input_output_aliases) restore Pallas
streaming bandwidth?

probe5 isolated the directions: in-only DMA ~0.21 ms/128MB, out-only
~0.21 ms, but any read+write pass ~0.82 ms (4x one direction, 2x a fused
XLA r+w pass) regardless of manual slot count.  The XLA comparison loop
runs in-place (donated buffer) — hypothesis: reading and writing the SAME
HBM pages (row-buffer locality / no controller ping-pong between two
regions) is what XLA wins on.  Test: pallas_call passthrough with
input_output_aliases={0: 0}, auto and manual pipelines.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys
sys.path.insert(0, '.')
from cales_tpu.ops.pallas_kernels import VMEM_BUDGET

NZ, NY, NX = 512, 256, 256
NITER = 300
_CP = pltpu.CompilerParams(vmem_limit_bytes=VMEM_BUDGET)


def timeit(fn, x, tag):
    run = jax.jit(lambda p: jax.lax.fori_loop(
        0, NITER, lambda _, q: fn(q), p))
    out = run(x)
    _ = float(jnp.sum(out.reshape(-1)[:8]))
    t0 = time.perf_counter()
    out = run(x)
    _ = float(jnp.sum(out.reshape(-1)[:8]))
    dt_ms = (time.perf_counter() - t0) * 1e3 / NITER - 32.0 / NITER
    print(f"{tag}: {dt_ms:.3f} ms", flush=True)
    return dt_ms


def auto_pass(tz, alias):
    def kernel(d_ref, o_ref):
        o_ref[...] = d_ref[...] * 1.0000001

    def run(arr):
        return pl.pallas_call(
            kernel,
            grid=(NZ // tz,),
            in_specs=[pl.BlockSpec((tz, NY, NX), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((tz, NY, NX), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NZ, NY, NX), jnp.float32),
            input_output_aliases={0: 0} if alias else {},
            compiler_params=_CP,
        )(arr)
    return run


def xla_pass():
    return lambda q: q * 1.0000001


def xla_two_buffer():
    """XLA elementwise WITHOUT in-place reuse: x -> roll(x) forces a real
    second buffer (output cannot alias input pages... roll may be in-place
    too; use flip which XLA cannot do in place linearly)."""
    return lambda q: jnp.flip(q, axis=0) * 1.0000001


def main():
    print('backend:', jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal((NZ, NY, NX)).astype(np.float32))

    timeit(xla_pass(), p, 'XLA elementwise (in-place loop)')
    timeit(xla_two_buffer(), p, 'XLA flip+scale (two-buffer)')
    timeit(auto_pass(8, False), p, 'pallas auto tz=8, no alias')
    timeit(auto_pass(8, True), p, 'pallas auto tz=8, ALIASED in-place')
    timeit(auto_pass(16, True), p, 'pallas auto tz=16, ALIASED in-place')


if __name__ == '__main__':
    main()
