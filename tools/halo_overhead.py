#!/usr/bin/env python3
"""Quantify the sharded kernel path's y-halo overhead on ONE chip.

The shard_map kernel path exchanges 8-row y-halo strips per side and runs
the kernels in y_ext mode ((ny_local+16)-row windows).  The ~5x v5e-8
projection (BASELINE.md) assumes this overhead is minor at the flagship
slab (ny_local = 64, i.e. 25% extra window rows).  This bench times the
momentum kernel in BOTH modes at the flagship per-chip block shape on one
chip — no mesh needed: y_ext mode just gets arrays that already carry the
16 extra rows (their content is irrelevant for timing).

Usage: python tools/halo_overhead.py   (real TPU)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, '.')
from cales_tpu.ops import pallas_kernels as pk

NZ, NY, NX = 512, 64, 1024      # flagship per-chip slab block (8x1 mesh)
NITER = 50


def run_mom(y_ext):
    ny_tot = NY + 16 if y_ext else NY
    rng = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    u, v, w, s_, p = (f(NZ, ny_tot, NX) for _ in range(5))
    ue, ve, we, se, pe = (f(3, ny_tot, NX) for _ in range(5))
    ruo, rvo, rwo = (f(NZ, NY, NX) for _ in range(3))
    dzci = np.ones(NZ + 2)
    dzfi = np.ones(NZ + 2)

    def step(args):
        u_, v_, w_, ruo_, rvo_, rwo_ = args
        outs = pk.fused_mom_rk(
            u_, v_, w_, s_, p, ue, ve, we, se, pe, ruo_, rvo_, rwo_,
            dzci, dzfi, 0.01, -0.005, 1e-4, 1.0, 1.0, (0.0, 0.0, 0.0),
            y_ext=y_ext)
        un, vn, wn, ru, rv, rw = outs[:6]
        if y_ext:
            un = jnp.pad(un, ((0, 0), (8, 8), (0, 0)), mode='wrap')
            vn = jnp.pad(vn, ((0, 0), (8, 8), (0, 0)), mode='wrap')
            wn = jnp.pad(wn, ((0, 0), (8, 8), (0, 0)), mode='wrap')
        return un, vn, wn, ru, rv, rw

    it = jax.jit(lambda a: jax.lax.fori_loop(0, NITER,
                                             lambda _, q: step(q), a))
    args = (u, v, w, ruo, rvo, rwo)
    out = it(args)
    _ = float(jnp.sum(out[0][0, 0, :8]))
    t0 = time.perf_counter()
    out = it(args)
    _ = float(jnp.sum(out[0][0, 0, :8]))
    dt_ms = (time.perf_counter() - t0) * 1e3 / NITER - 32.0 / NITER
    return dt_ms


def main():
    print('backend:', jax.default_backend(), flush=True)
    t_int = run_mom(False)
    print(f'momentum kernel interior mode : {t_int:.3f} ms', flush=True)
    t_ext = run_mom(True)
    # the wrap-pad in the y_ext loop body re-materializes the halo rows --
    # an upper bound on what the real ppermute exchange costs per iteration
    print(f'momentum kernel y_ext mode    : {t_ext:.3f} ms '
          f'(incl. wrap-pad halo rebuild)', flush=True)
    print(f'halo overhead <= {100 * (t_ext / t_int - 1):.1f}% '
          f'at ny_local={NY}')


if __name__ == '__main__':
    main()
