#!/usr/bin/env python3
"""Manual-DMA pipeline probe: can a hand-rolled S-slot pipeline beat the
pallas_call auto-pipeline's ~330 GB/s streaming cap?

probe4 ruled out per-operand DMA concurrency.  Remaining hypothesis: with
the auto-pipeline's 2 slots, slot reuse serializes out-DMA(i-1) against
in-DMA(i+1) (same buffer), halving effective bandwidth — which matches the
exactly-2x gap vs an XLA elementwise pass.  A 3+-slot manual pipeline
breaks that chain.  Also isolates each direction (in-only reduce kernel,
out-only fill kernel).
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
from cales_tpu.ops.pallas_kernels import VMEM_BUDGET

NZ, NY, NX = 512, 256, 256
NITER = 300
_CP = pltpu.CompilerParams(vmem_limit_bytes=VMEM_BUDGET)


def timeit(fn, x, tag, out_like=None):
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


def reduce_in(tz):
    """In-stream only: accumulate block sums into one (8, 128) tile.
    fori body needs shape-preserving fn, so wrap: x -> x scaled by the tiny
    sum (keeps the read stream live, adds one elementwise pass)."""
    def kernel(d_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)
        s = jnp.sum(d_ref[...], axis=(0, 1)).reshape(1, NX)
        o_ref[...] += jnp.broadcast_to(s, (8, NX))

    def red(arr):
        return pl.pallas_call(
            kernel,
            grid=(NZ // tz,),
            in_specs=[pl.BlockSpec((tz, NY, NX), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((8, NX), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, NX), jnp.float32),
            compiler_params=_CP,
        )(arr)
    return lambda q: q * (1.0 + 1e-30 * jnp.sum(red(q)))


def fill_out(tz):
    """Out-stream only: write blocks from a small seed (input is one tile);
    body maps small -> big, so time big->small->big chain minus known costs.
    Simpler: keep fn big->big: out = fill(seed from q's first tile)."""
    def kernel(d_ref, o_ref):
        o_ref[...] = jnp.broadcast_to(d_ref[0, :1, :] * 1e-30,
                                      o_ref.shape)

    def run(arr):
        return pl.pallas_call(
            kernel,
            grid=(NZ // tz,),
            in_specs=[pl.BlockSpec((1, 8, NX), lambda i: (0, 0, 0))],
            out_specs=pl.BlockSpec((tz, NY, NX), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NZ, NY, NX), jnp.float32),
            compiler_params=_CP,
        )(arr[:1, :8, :])
    return run


def manual_pass(tz, S):
    """Hand-rolled S-slot passthrough: HBM->VMEM->HBM with explicit DMAs."""
    N = NZ // tz

    def kernel(hin, hout, scr, isem, osem):
        i = pl.program_id(0)

        def cin(b, s):
            return pltpu.make_async_copy(
                hin.at[pl.ds(b * tz, tz)], scr.at[s], isem.at[s])

        def cout(b, s):
            return pltpu.make_async_copy(
                scr.at[s], hout.at[pl.ds(b * tz, tz)], osem.at[s])

        slot = jax.lax.rem(i, S)

        @pl.when(i == 0)
        def _():
            cin(0, 0).start()

        @pl.when(i + 1 < N)
        def _():
            nxt = jax.lax.rem(i + 1, S)

            @pl.when(i + 1 >= S)
            def _():
                cout(i + 1 - S, nxt).wait()
            cin(i + 1, nxt).start()

        cin(i, slot).wait()
        cout(i, slot).start()

        @pl.when(i == N - 1)
        def _():
            for db in range(S):
                b = N - S + db
                if b >= 0:
                    cout(b, b % S).wait()

    def run(arr):
        return pl.pallas_call(
            kernel,
            grid=(N,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((NZ, NY, NX), jnp.float32),
            scratch_shapes=[pltpu.VMEM((S, tz, NY, NX), jnp.float32),
                            pltpu.SemaphoreType.DMA((S,)),
                            pltpu.SemaphoreType.DMA((S,))],
            compiler_params=_CP,
        )(arr)
    return run


def main():
    print('backend:', jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal((NZ, NY, NX)).astype(np.float32))

    timeit(reduce_in(8), p, 'in-only reduce tz=8 (+1 elementwise pass)')
    timeit(fill_out(8), p, 'out-only fill tz=8')
    for S in (2, 3, 4, 6):
        for tz in (8, 16):
            timeit(manual_pass(tz, S), p, f'manual pass S={S} tz={tz}')


if __name__ == '__main__':
    main()
