#!/usr/bin/env python3
"""Raw MXU rate probe: XLA vs Pallas dot at solve-like shapes (dev tool)."""
import time
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from functools import partial

K = 512
N = 65536


def timeit(fn, *args, tag='', niter=20, flops=0):
    run = jax.jit(lambda *a: jax.lax.fori_loop(
        0, niter,
        lambda _, c: (fn(*a[:-1], c) * 1e-3).astype(a[-1].dtype), a[-1]))
    out = run(*args)
    _ = float(jnp.sum(out[0, :8]))
    t0 = time.perf_counter()
    out = run(*args)
    _ = float(jnp.sum(out[0, :8]))
    ms = (time.perf_counter() - t0) * 1e3 / niter
    print(f"{tag}: {ms:.3f} ms  ({flops / ms * 1e-9:.1f} TFLOP/s)")


def main():
    print('backend:', jax.default_backend())
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((K, K)).astype(np.float32))
    X = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32))
    fl = 2 * K * K * N

    timeit(lambda a, x: jnp.matmul(a, x, precision=jax.lax.Precision.HIGH),
           A, X, tag='XLA f32 HIGH (bf16x3)', flops=3 * fl)
    timeit(lambda a, x: jnp.matmul(a, x,
                                   precision=jax.lax.Precision.DEFAULT),
           A, X, tag='XLA f32 DEFAULT', flops=fl)
    Ab, Xb = A.astype(jnp.bfloat16), X.astype(jnp.bfloat16)
    timeit(lambda a, x: jnp.matmul(a, x,
                                   preferred_element_type=jnp.float32),
           Ab, Xb, tag='XLA bf16xbf16->f32', flops=fl)

    from cales_tpu.ops.pallas_kernels import _COMPILER_PARAMS as CP
    # pallas: grid over N blocks, one dot per block
    TN = 2048

    def kern(a_ref, x_ref, o_ref, *, prec):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], x_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

    def pl_mm(a, x, prec, in_dt):
        return pl.pallas_call(
            partial(kern, prec=prec),
            grid=(N // TN,),
            in_specs=[pl.BlockSpec((K, K), lambda i: (0, 0)),
                      pl.BlockSpec((K, TN), lambda i: (0, i))],
            out_specs=pl.BlockSpec((K, TN), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((K, N), jnp.float32),
            compiler_params=CP,
        )(a.astype(in_dt), x.astype(in_dt))

    timeit(lambda a, x: pl_mm(a, x, None, jnp.bfloat16),
           A, X, tag='Pallas bf16 dot', flops=fl)
    from cales_tpu.ops.pallas_kernels import _dot_xop, _COMPILER_PARAMS

    def kern3(a_ref, x_ref, o_ref):
        o_ref[...] = _dot_xop(a_ref[...], x_ref[...])

    def pl_mm3(a, x):
        return pl.pallas_call(
            kern3,
            grid=(N // TN,),
            in_specs=[pl.BlockSpec((K, K), lambda i: (0, 0)),
                      pl.BlockSpec((K, TN), lambda i: (0, i))],
            out_specs=pl.BlockSpec((K, TN), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((K, N), jnp.float32),
            compiler_params=CP,
        )(a, x)

    timeit(pl_mm3, A, X, tag='Pallas _dot_xop (bf16x3)', flops=3 * fl)


if __name__ == '__main__':
    main()
