"""FFT/MXU eigenfunction-expansion direct Poisson/Helmholtz solver.

TPU-native rebuild of the reference solver stack:
  * setup: /root/reference/src/initsolver.f90:17-169 (eigenvalues, tridmatrix)
  * solve: /root/reference/src/solver.f90:20-233 (transform -> batched Thomas
    in z -> inverse transform), solver_gpu.f90:32-477
  * BC inhomogeneity planes: /root/reference/src/bound.f90:447-617
    (cmpt_rhs_b / bc_rhs / updt_rhs_b)

Arrays are (nz, ny, nx); transforms act along x (axis -1) then y (axis -2),
then a batched Thomas sweep runs along z (axis 0).  On a device mesh the
re-shardings between those stages become XLA all-to-alls — the analogue of the
reference's cuDecomp pencil transposes (solver_gpu.f90:80-158).

Normalization: all transform pairs are exact inverses, so the reference's
``normfft`` scalar (fft.f90:62-142) is identically 1 here.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config
from .grid import Grid
from .ops import transforms as tr
from .ops.tridiag import thomas, thomas_periodic


def tridmatrix(bc: str, n: int, dzci: np.ndarray, dzfi: np.ndarray,
               c_or_f: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """z tridiagonal coefficients (initsolver.f90:127-169).  dzci/dzfi are the
    (n+2,) inverse-spacing arrays with ghost entries."""
    k = np.arange(1, n + 1)
    if c_or_f == 'c':
        a = dzfi[k] * dzci[k - 1]
        c = dzfi[k] * dzci[k]
    else:
        a = dzfi[k] * dzci[k]
        c = dzfi[k + 1] * dzci[k]
    b = -(a + c)
    factor = {'P': 0.0, 'D': -1.0, 'N': 1.0}
    if c_or_f == 'c':
        b[0] += factor[bc[0]] * a[0]
        b[-1] += factor[bc[1]] * c[-1]
    else:
        if bc[0] == 'N':
            b[0] += factor[bc[0]] * a[0]
        if bc[1] == 'N':
            b[-1] += factor[bc[1]] * c[-1]
    return a, b, c


def _z_eigendecomposition(a, b, c, weights, periodic):
    """Eigendecomposition of the z tridiagonal operator T (matrix
    diagonalization method; replaces the sequential Thomas sweep with two
    MXU matmuls along z — no loop-carried dependency on TPU).

    T is similar to a symmetric matrix via D^{1/2} with D = diag(weights):
    weights = dzf (cell-centered z) or dzc (face-centered z) make
    (D T)_{k,k-1} == (D T)_{k-1,k}, so M = D^{1/2} T D^{-1/2} is symmetric
    and T = D^{-1/2} Q L Q^T D^{1/2} with Q orthonormal from eigh
    (numerically stable for stretched grids).  If the similarity fails (e.g.
    periodic z with a non-periodic stretching), falls back to a general
    eigendecomposition.

    Returns (Vl, Vr, lamz) float64 with solve((T + s I) x = r) as
    x = Vr @ (Vl @ r / (lamz + s)).
    """
    n = len(b)
    T = np.zeros((n, n))
    for k in range(n):
        T[k, k] = b[k]
        if k > 0:
            T[k, k - 1] = a[k]
        if k < n - 1:
            T[k, k + 1] = c[k]
    if periodic:
        T[0, n - 1] = a[0]
        T[n - 1, 0] = c[n - 1]
    d = np.sqrt(weights[1:n + 1])
    M = (d[:, None] * T) / d[None, :]
    if np.allclose(M, M.T, rtol=1e-12, atol=1e-12):
        lamz, Q = np.linalg.eigh(0.5 * (M + M.T))
        Vl = Q.T * d[None, :]          # Q^T D^{1/2}
        Vr = Q / d[:, None]            # D^{-1/2} Q
    else:
        lam_c, V = np.linalg.eig(T)
        if np.abs(lam_c.imag).max() > 1e-10 or np.abs(V.imag).max() > 1e-10:
            # genuinely complex spectrum (e.g. periodic z on a stretched grid):
            # a real eigendecomposition does not exist — refuse rather than
            # silently truncate; the caller should use zsolver='thomas'.
            raise ValueError(
                "z operator has a complex eigendecomposition (periodic z with "
                "a stretched grid?); use zsolver='thomas' for this config")
        idx = np.argsort(lam_c.real)
        lamz = lam_c.real[idx]
        Vr = V.real[:, idx]
        Vl = np.linalg.inv(Vr)
    return Vl, Vr, lamz


@dataclass(frozen=True)
class DirectSolver:
    """Prebuilt direct solver for one field (pressure or a velocity component)."""
    ng: tuple[int, int, int]
    c_or_f: tuple[str, str, str]
    bcx: str
    bcy: str
    bcz: str
    trx: tr.Transform1D
    try_: tr.Transform1D
    a: np.ndarray          # (nz,) float64
    b: np.ndarray
    c: np.ndarray
    lamx: np.ndarray       # scaled by dxi^2, full-length float64
    lamy: np.ndarray       # scaled by dyi^2
    # z eigen-solver operators (matrix diagonalization method)
    zVl: np.ndarray | None = None    # (nzs, nzs)
    zVr: np.ndarray | None = None
    lamz: np.ndarray | None = None   # (nzs,)
    zsolver: str = 'eig'             # 'eig' (MXU matmuls) | 'thomas' (scan)

    @property
    def qz(self) -> int:
        # last z plane excluded for face-staggered Dirichlet top (solver.f90:55-56)
        return 1 if (self.c_or_f[2] == 'f' and self.bcz[1] == 'D') else 0


def make_solver(cfg: Config, grid: Grid, cbc, c_or_f,
                zsolver: str = 'eig') -> DirectSolver:
    """cbc: per-direction BC pairs [(lo,hi) x 3] as two-letter strings."""
    nx, ny, nz = cfg.ng
    dli = cfg.dli

    def pp_mat(n):
        mode = getattr(cfg, 'ptransform', 'auto')
        if mode == 'auto':
            return jax.default_backend() == 'tpu' and n <= 4096
        return mode == 'mat'

    trx = tr.make_transform(cbc[0], c_or_f[0], nx, pp_mat=pp_mat(nx))
    try_ = tr.make_transform(cbc[1], c_or_f[1], ny, pp_mat=pp_mat(ny))
    a, b, c = tridmatrix(cbc[2], nz, grid.dzci, grid.dzfi, c_or_f[2])
    lamx = trx.lam * dli[0] ** 2
    lamy = try_.lam * dli[1] ** 2
    qz = 1 if (c_or_f[2] == 'f' and cbc[2][1] == 'D') else 0
    nzs = nz - qz
    weights = grid.dzf if c_or_f[2] == 'c' else grid.dzc
    zVl = zVr = lamz = None
    if zsolver == 'eig':
        try:
            zVl, zVr, lamz = _z_eigendecomposition(a[:nzs], b[:nzs], c[:nzs],
                                                   weights, cbc[2] == 'PP')
        except ValueError:
            import warnings
            warnings.warn('z eigendecomposition unavailable for this config; '
                          "falling back to zsolver='thomas'")
            zsolver = 'thomas'
    return DirectSolver(ng=cfg.ng, c_or_f=tuple(c_or_f), bcx=cbc[0], bcy=cbc[1],
                        bcz=cbc[2], trx=trx, try_=try_, a=a, b=b, c=c,
                        lamx=lamx, lamy=lamy, zVl=zVl, zVr=zVr, lamz=lamz,
                        zsolver=zsolver)


def pallas_eligible(sv: DirectSolver, shape, itemsize) -> bool:
    """Whether the 3-pass aliased Pallas solve (ops/pallas_solve.py) can
    run, for EITHER in/out contract — x-spectral (the kernel x fusion,
    pre_xformed_x == skip_bwd_x == True) or physical (the x matmuls ride
    the y passes as flat in-kernel dots): all-matmul square x/y transforms
    with no excluded rows, z stage with no excluded plane, single
    device."""
    from .ops import pallas_solve as ps
    nz, ny, nx = shape
    return (sv.zsolver == 'eig' and sv.qz == 0
            and sv.trx.kind == 'mat' and sv.trx.nsolve == nx
            and sv.try_.kind == 'mat' and sv.try_.nsolve == ny
            and ps.eligible(nz, ny, nx, itemsize))


def pallas_sharded_eligible(sv: DirectSolver, shape, itemsize, mesh) -> bool:
    """Whether the slab-sharded aliased Pallas solve can run: mesh
    (gy>1, gx=1), all-matmul square transforms, Thomas-tileable z, and the
    post-transpose per-shard lane count a multiple of 128."""
    from .ops import pallas_solve as ps
    if mesh is None:
        return False
    gy = mesh.shape.get('gy', 1)
    gx = mesh.shape.get('gx', 1)
    nz, ny, nx = shape
    if gx != 1 or gy < 2 or ny % gy or nx % gy or (nx // gy) % 128:
        return False
    nxl = nx // gy
    return (sv.zsolver == 'eig' and sv.qz == 0 and sv.bcz != 'PP'
            and sv.trx.kind == 'mat' and sv.trx.nsolve == nx
            and sv.try_.kind == 'mat' and sv.try_.nsolve == ny
            and nx % 128 == 0 and (ny // gy) % 8 == 0
            and ps.y_tiles(nz, ny // gy, nx, itemsize) is not None
            and ps.y_tiles(nz, ny, nxl, itemsize) is not None
            and ps.thomas_z_tiles(nz, ny, nxl, itemsize) is not None)


def solve_sharded_pallas(sv: DirectSolver, p, mesh, pallas_interpret=False):
    """Slab-sharded (gy>1, gx=1) Poisson solve as per-shard aliased Pallas
    passes around two explicit all-to-all pencil transposes — the
    kernel-path analogue of the hints/GSPMD solve (solver_gpu.f90:80-158):

      fwd-x (x locally complete)            1 aliased pass
      all_to_all: split x, gather y         (nz, ny, nx//gy) per shard
      fwd-y / Thomas-z / bwd-y              3 aliased passes
      all_to_all back                       (nz, ny//gy, nx)
      bwd-x                                 1 aliased pass

    Caller must have checked pallas_sharded_eligible()."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from .ops import pallas_solve as ps

    gy = mesh.shape['gy']
    nz, ny, nx = p.shape
    nxl = nx // gy
    fxT = np.asarray(sv.trx.fwd_mat).T.copy()
    bxT = np.asarray(sv.trx.bwd_mat).T.copy()
    lam_scale = float(np.abs(sv.lamx).max() + np.abs(sv.lamy).max())
    tol = float(np.finfo(np.dtype(p.dtype)).eps * lam_scale * 4.0)
    lamx_full = np.asarray(sv.lamx)
    pin = sv.bcz == 'NN'

    def local(r):                       # (nz, ny//gy, nx)
        i = jax.lax.axis_index('gy')
        r = ps.apply_x(r, fxT, alias=True, interpret=pallas_interpret)
        r = jax.lax.all_to_all(r, 'gy', split_axis=2, concat_axis=1,
                               tiled=True)      # (nz, ny, nxl)
        lamx_l = jax.lax.dynamic_slice(
            jnp.asarray(lamx_full, r.dtype), (i * nxl,), (nxl,))
        r = ps.apply_y(r, sv.try_.fwd_mat, alias=True,
                       interpret=pallas_interpret)
        r = ps.apply_thomas_z(r, sv.a, sv.b, sv.c, sv.lamy, lamx_l,
                              pin_singular=pin, tol=tol,
                              interpret=pallas_interpret)
        r = ps.apply_y(r, sv.try_.bwd_mat, alias=True,
                       interpret=pallas_interpret)
        r = jax.lax.all_to_all(r, 'gy', split_axis=1, concat_axis=2,
                               tiled=True)      # (nz, ny//gy, nx)
        return ps.apply_x(r, bxT, alias=True, interpret=pallas_interpret)

    return shard_map(local, mesh=mesh,
                     in_specs=P(None, 'gy', 'gx'),
                     out_specs=P(None, 'gy', 'gx'), check_vma=False)(p)


def solve_z_only_sharded(sv: DirectSolver, p, alpha, mesh,
                         pallas_interpret=False):
    """Per-shard z-only CN Helmholtz (the _IMPDIFF_1D solves) under
    shard_map: z is never sharded, so each shard solves its own
    (nz, ny_loc, nx_loc) block with ZERO communication — the aliased
    Pallas Thomas pass when the shard tiles (nx_loc % 128 == 0), else the
    scan fallback per shard."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def local(r):
        return solve_z_only(sv, r, alpha, pallas=True,
                            pallas_interpret=pallas_interpret)

    return shard_map(local, mesh=mesh, in_specs=P(None, 'gy', 'gx'),
                     out_specs=P(None, 'gy', 'gx'), check_vma=False)(p)


def pallas_helmholtz_eligible(sv: DirectSolver, shape, itemsize) -> bool:
    """Whether the aliased Pallas Helmholtz pipeline (solve with alpha) can
    run for this component solver: all-matmul square x/y transforms and a
    Thomas-tileable z stage (qz handled via the in-kernel passthrough
    tail; periodic z via the rank-1 kernel)."""
    from .ops import pallas_solve as ps
    nz, ny, nx = shape
    return (sv.trx.kind == 'mat' and sv.trx.nsolve == nx
            and sv.try_.kind == 'mat' and sv.try_.nsolve == ny
            and nx % 128 == 0 and ny % 8 == 0
            and ps.thomas_z_tiles(nz, ny, nx, itemsize) is not None
            and ps.y_tiles(nz, ny, nx, itemsize) is not None
            and (sv.bcz != 'PP' or (sv.qz == 0 and nz >= 3))
            and nz - sv.qz >= 2)


def solve(sv: DirectSolver, p, alpha=None, hints=None,
          pre_xformed_x=False, skip_bwd_x=False, pre_xformed_xy=False,
          pallas=False, pallas_interpret=False):
    """Solve L p_new = p (Poisson) or (I + alpha*L) p_new = p (Helmholtz,
    main.f90:424-443 with alpha = -nu*dt_rk/2) in place of the input RHS.

    p: (nz, ny, nx) interior array.  Returns the solution with excluded
    boundary slices (face-staggered Dirichlet) passed through unchanged.

    `hints` (parallel.mesh.ShardingHints): sharding constraints around each
    stage; GSPMD lowers the reshardings to the all-to-all pencil transposes
    of the reference (solver_gpu.f90:80-158).

    pre_xformed_x / skip_bwd_x: the caller already applied / will apply the
    x operator matmul itself (the Pallas-kernel x-transform fusion: the
    projection RHS leaves the momentum kernel x-spectral and the corrector
    kernel consumes the solution x-spectral, putting those matmuls on the
    kernels' otherwise-idle MXU).  pre_xformed_xy: the RHS arrives fully
    (x AND y)-transformed in the untransposed (z, ky, kx) layout (the
    fillps kernel's accumulated y contraction); the backward y transform
    still runs here.  Requires the all-matmul square-transform path (kind
    'mat', nsolve == n) with no mesh.

    pallas: run the whole y/z pipeline as 3 Pallas passes
    (ops/pallas_solve.py) — caller must have checked pallas_eligible()."""
    nz, ny, nx = p.shape
    if pallas and alpha is not None and hints is None and not pre_xformed_xy:
        # Helmholtz (I + alpha*L) variant of the aliased pipeline: the CN
        # viscous solves of the full-3D implicit-diffusion path
        # (main.f90:423-443).  Same three in-place passes; the z stage is
        # the Thomas sweep on the alpha-scaled rows (tridiag a*alpha,
        # b*alpha+1, c*alpha with diag shift lamxy*alpha — never singular),
        # with the qz face-staggered Dirichlet tail passed through.
        from .ops import pallas_solve as ps
        assert not (pre_xformed_x or skip_bwd_x)
        assert pallas_helmholtz_eligible(sv, p.shape, p.dtype.itemsize)
        xyf = np.asarray(sv.trx.fwd_mat).T.copy()
        xyb = np.asarray(sv.trx.bwd_mat).T.copy()
        a2, b2, c2 = sv.a * alpha, sv.b * alpha + 1.0, sv.c * alpha
        lamy2, lamx2 = sv.lamy * alpha, sv.lamx * alpha
        body = ps.apply_y(p, sv.try_.fwd_mat, alias=True, MxT=xyf,
                          interpret=pallas_interpret)
        if sv.bcz == 'PP':
            body = ps.apply_thomas_periodic_z(
                body, a2, b2, c2, lamy2, lamx2, pin_singular=False,
                tol=0.0, interpret=pallas_interpret)
        else:
            body = ps.apply_thomas_z(
                body, a2, b2, c2, lamy2, lamx2, pin_singular=False,
                tol=0.0, interpret=pallas_interpret,
                n_solve=nz - sv.qz if sv.qz else None)
        return ps.apply_y(body, sv.try_.bwd_mat, alias=True, MxT=xyb,
                          interpret=pallas_interpret)
    if pallas and alpha is None and hints is None and not pre_xformed_xy:
        assert pre_xformed_x == skip_bwd_x and \
            pallas_eligible(sv, p.shape, p.dtype.itemsize)
        import os as _os
        from .ops import pallas_solve as ps
        # Aliased 3-pass pipeline: all passes share the native (nz, ny, nx)
        # layout so each runs IN PLACE (input_output_aliases -> ~2x
        # streaming bandwidth, tools/solve_probe6.py).  Without the
        # kernel-side x fusion (pre_xformed_x=False: triperiodic / impdiff
        # / WMLES / duct / cavity classes) the x operator matmuls ride the
        # same two passes as one extra flat (tz*ny, nx) MXU dot each — the
        # full x+y transform still costs ONE pass of HBM traffic per side.
        # z stage: O(nz) in-VMEM Thomas sweep for non-periodic z (2.09 ->
        # 1.31 ms/solve at 512x256x256 f32, tools/solve_probe7.py);
        # aliased eigen matmuls for periodic z.
        xyf = None if pre_xformed_x else np.asarray(sv.trx.fwd_mat).T.copy()
        xyb = None if skip_bwd_x else np.asarray(sv.trx.bwd_mat).T.copy()
        body = ps.apply_y(p, sv.try_.fwd_mat, alias=True, MxT=xyf,
                          interpret=pallas_interpret)
        # z-stage pick (round 5, measured on TPU): the O(nz) in-kernel
        # Thomas sweep wins at large nz (512x256x256: solve 2.09 -> 1.31
        # ms) where the eig stage's two (nz, nz) matmuls dominate, but
        # LOSES at the 256-class (triperiodic 0.2262 vs 0.2075
        # ns/cell/substep: the sweep's nz sequential steps over small
        # (ty, txn) slabs vectorize poorly while the MXU absorbs the
        # smaller matmuls easily).  Default: Thomas from nz >= 384;
        # CALES_PSOLVE_THOMAS=1 / CALES_NO_PSOLVE_THOMAS=1 force it
        # on / off
        want_thomas = (nz >= 384
                       or _os.environ.get('CALES_PSOLVE_THOMAS', '') == '1')
        if (_os.environ.get('CALES_NO_PSOLVE_THOMAS', '') != '1'
                and want_thomas
                and ps.thomas_z_tiles(nz, ny, nx, p.dtype.itemsize)
                and (sv.bcz != 'PP' or nz >= 3)):
            lam_scale = float(np.abs(sv.lamx).max() + np.abs(sv.lamy).max())
            tol = np.finfo(np.dtype(p.dtype)).eps * lam_scale * 4.0
            if sv.bcz == 'PP':
                body = ps.apply_thomas_periodic_z(
                    body, sv.a, sv.b, sv.c, sv.lamy, sv.lamx,
                    pin_singular=True, tol=tol,
                    interpret=pallas_interpret)
            else:
                body = ps.apply_thomas_z(
                    body, sv.a, sv.b, sv.c, sv.lamy, sv.lamx,
                    pin_singular=sv.bcz == 'NN', tol=tol,
                    interpret=pallas_interpret)
        else:
            scale = float(np.abs(sv.lamz).max() + np.abs(sv.lamx).max()
                          + np.abs(sv.lamy).max())
            tol = np.finfo(np.dtype(p.dtype)).eps * scale * 4.0
            body = ps.apply_z_eig(body, sv.zVl, sv.zVr, sv.lamz, sv.lamy,
                                  sv.lamx, tol, alias=True,
                                  interpret=pallas_interpret)
        return ps.apply_y(body, sv.try_.bwd_mat, alias=True, MxT=xyb,
                          interpret=pallas_interpret)
    sx, sy = sv.trx.nsolve, sv.try_.nsolve
    if pre_xformed_xy:
        pre_xformed_x = True
    if pre_xformed_x or skip_bwd_x:
        assert (sv.trx.kind == 'mat' and sx == nx and hints is None), \
            'x-transform fusion needs the square all-matmul path'
    if pre_xformed_xy:
        assert sv.try_.kind == 'mat' and sy == ny
    tail_x = p[..., sx:]
    body = p[..., :sx]
    tail_y = body[:, sy:, :]
    body = body[:, :sy, :]

    # forward transforms: x (axis -1) then y.  When both directions are
    # operator matrices (the TPU default) and no mesh is attached, the y
    # stages run in a (z, x, y) transposed layout with ONE explicit
    # transpose each way — y-minor matmuls without the per-stage
    # moveaxis round trips (2 fewer relayout passes per solve)
    both_mat = (sv.trx.kind == 'mat' and sv.try_.kind == 'mat'
                and hints is None and not pre_xformed_xy)
    if hints is not None:
        body = hints.x_local(body)
    if not pre_xformed_x:
        body = tr.fwd(sv.trx, body, axis=-1)
    x_was_fft = sv.trx.kind == 'fft'
    if hints is not None:
        body = hints.y_local(body)
    if both_mat:
        body = jnp.swapaxes(body, 1, 2)          # (z, x, y)
        body = tr.fwd(sv.try_, body, axis=-1)
    elif not pre_xformed_xy:
        body = tr.fwd(sv.try_, body, axis=-2)
    y_was_rfft = (sv.try_.kind == 'fft') and not x_was_fft
    if hints is not None:
        body = hints.z_local(body)

    # eigenvalue grids matching the spectral shape; assembled in-trace from
    # the 1D profiles (a precomputed 2D/3D grid would inline as a huge literal)
    rdt0 = body.real.dtype if jnp.iscomplexobj(body) else body.dtype
    lamx_np = sv.lamx[: nx // 2 + 1] if x_was_fft else sv.lamx
    lamy_np = sv.lamy[: ny // 2 + 1] if y_was_rfft else sv.lamy
    if both_mat:
        # spectral layout is (z, kx, ky)
        lamxy = (jnp.asarray(lamx_np, dtype=rdt0)[:, None]
                 + jnp.asarray(lamy_np, dtype=rdt0)[None, :])
    else:
        lamxy = (jnp.asarray(lamy_np, dtype=rdt0)[:, None]
                 + jnp.asarray(lamx_np, dtype=rdt0)[None, :])

    # z-direction solve with modified-wavenumber diagonal shift
    qz = sv.qz
    zbody = body[: nz - qz]
    rdt = zbody.real.dtype if jnp.iscomplexobj(zbody) else zbody.dtype
    if sv.zsolver == 'eig':
        # matrix diagonalization method: two MXU matmuls along z instead of a
        # sequential Thomas sweep (see _z_eigendecomposition)
        Vl = jnp.asarray(sv.zVl, dtype=rdt)
        Vr = jnp.asarray(sv.zVr, dtype=rdt)
        lamz_j = jnp.asarray(sv.lamz, dtype=rdt)
        lam3 = lamz_j[:, None, None] + lamxy[None, :, :]
        if alpha is not None:
            den = lam3 * alpha + 1.0
            inv = 1.0 / den
        else:
            # project out the (exactly) singular constant mode instead of the
            # reference's eps-regularized pivot (solver.f90:165-169)
            scale = float(np.abs(sv.lamz).max()
                          + np.abs(lamx_np).max() + np.abs(lamy_np).max())
            tol = np.finfo(np.dtype(rdt)).eps * scale * 4.0
            inv = jnp.where(jnp.abs(lam3) > tol, 1.0 / lam3, 0.0)
        # f32 -> bf16x3 passes; divergence-validated like the transform
        # matmuls (ops/transforms._matmul_axis); f64 stays full precision
        prec = (jax.lax.Precision.HIGH if rdt == jnp.float32
                else jax.lax.Precision.HIGHEST)
        hat = jnp.tensordot(Vl, zbody, axes=(1, 0), precision=prec)
        hat = hat * inv
        zsol = jnp.tensordot(Vr, hat, axes=(1, 0), precision=prec)
        zsol = zsol.astype(zbody.dtype)
    else:
        a, b, c = sv.a, sv.b, sv.c
        lam = lamxy
        if alpha is not None:
            a = a * alpha
            b = b * alpha + 1.0
            c = c * alpha
            lam = lamxy * alpha
        lam_j = jnp.asarray(lam, dtype=rdt)
        # eps pivots only for the exactly singular pure-Poisson mode
        reg = alpha is None
        if sv.bcz == 'PP':
            zsol = thomas_periodic(a, b, c, zbody, lam=lam_j, regularize=reg)
        else:
            zsol = thomas(a[: nz - qz], b[: nz - qz], c[: nz - qz], zbody,
                          lam=lam_j, regularize=reg)
    body = jnp.concatenate([zsol, body[nz - qz:]], axis=0) if qz else zsol

    # inverse transforms: y then x
    if hints is not None:
        body = hints.y_local(body)
    if both_mat:
        body = tr.bwd(sv.try_, body, axis=-1, n=sy, real_out=not x_was_fft)
        body = jnp.swapaxes(body, 1, 2)          # back to (z, y, x)
    else:
        body = tr.bwd(sv.try_, body, axis=-2, n=sy, real_out=not x_was_fft)
    if hints is not None:
        body = hints.x_local(body)
    if not skip_bwd_x:
        body = tr.bwd(sv.trx, body, axis=-1, n=sx, real_out=True)
    body = body.real if jnp.iscomplexobj(body) else body
    body = body.astype(p.dtype)
    if hints is not None:
        body = hints.field(body)

    if tail_y.shape[1]:
        body = jnp.concatenate([body, tail_y], axis=1)
    if tail_x.shape[-1]:
        body = jnp.concatenate([body, tail_x], axis=-1)
    return body


def solve_z_only(sv: DirectSolver, p, alpha, pallas=False,
                 pallas_interpret=False, shift=None, bc_planes=None):
    """z-implicit-only Helmholtz solve (I + alpha*Lz) p = rhs with no x/y
    transforms (solver_gaussel_z, solver.f90:182-233; the _IMPDIFF_1D path).

    pallas: one aliased in-place Pallas Thomas pass
    (ops/pallas_solve.apply_thomas_helmholtz_z) instead of the two (nz, nz)
    eigen matmul passes — the caller must be on a single device with a
    TPU-f32 (or interpret) kernel path.

    shift: traced constant added to the RHS inside the pass — the folded
    bulk-forcing add (reference order: u += f THEN solve, rk.f90:197-222 +
    main.f90:423-431; adding f to the RHS is identical and saves the
    full-field read+write the separate add would cost).

    bc_planes: optional ((ny, nx) lo, hi) z-face RHS boundary planes
    (updt_rhs_b) added to rows 0 / (nz - qz - 1) — in-register on the
    Pallas path (saving the host-side dynamic-update-slice adds), as
    .at[].add on the fallback paths."""
    nz = p.shape[0]
    qz = sv.qz
    if pallas and sv.bcz != 'PP':
        from .ops import pallas_solve as ps
        if ps.thomas_z_tiles(nz, p.shape[1], p.shape[2],
                             p.dtype.itemsize) and p.shape[2] % 128 == 0:
            n = nz - qz
            a = sv.a[:n] * alpha
            b = sv.b[:n] * alpha + 1.0
            c = sv.c[:n] * alpha
            bkw = {}
            if bc_planes is not None:
                bkw = dict(bc_lo=bc_planes[0], bc_hi=bc_planes[1])
            # the face-staggered Dirichlet tail (qz) passes through (and
            # takes the shift) IN-KERNEL: no host-side slice+concat passes
            return ps.apply_thomas_helmholtz_z(
                p, a, b, c, interpret=pallas_interpret, shift=shift,
                n_solve=n if qz else None, **bkw)
    if bc_planes is not None:
        p = p.at[0].add(jnp.asarray(bc_planes[0], p.dtype))
        p = p.at[nz - qz - 1].add(jnp.asarray(bc_planes[1], p.dtype))
    zbody = p[: nz - qz]
    if shift is not None:
        zbody = zbody + shift
        p = p if qz == 0 else jnp.concatenate(
            [zbody, p[nz - qz:] + shift], axis=0)
    if sv.zsolver == 'eig':
        rdt = zbody.dtype
        Vl = jnp.asarray(sv.zVl, dtype=rdt)
        Vr = jnp.asarray(sv.zVr, dtype=rdt)
        inv = 1.0 / (jnp.asarray(sv.lamz, dtype=rdt) * alpha + 1.0)
        prec = (jax.lax.Precision.HIGH if rdt == jnp.float32
                else jax.lax.Precision.HIGHEST)
        hat = jnp.tensordot(Vl, zbody, axes=(1, 0), precision=prec)
        hat = hat * inv[:, None, None]
        zsol = jnp.tensordot(Vr, hat, axes=(1, 0), precision=prec).astype(rdt)
    else:
        a = sv.a * alpha
        b = sv.b * alpha + 1.0
        c = sv.c * alpha
        if sv.bcz == 'PP':
            zsol = thomas_periodic(a, b, c, zbody, regularize=False)
        else:
            zsol = thomas(a[: nz - qz], b[: nz - qz], c[: nz - qz], zbody,
                          regularize=False)
    return jnp.concatenate([zsol, p[nz - qz:]], axis=0) if qz else zsol


# ---------------------------------------------------------------------------
# BC inhomogeneity planes (bound.f90:447-617)
# ---------------------------------------------------------------------------

def rhs_bound_planes(cfg: Config, grid: Grid, cbc, c_or_f, bcvals):
    """Compute the additive RHS boundary planes (cmpt_rhs_b/bc_rhs,
    bound.f90:447-560).

    bcvals: per-direction pair of 2D arrays or scalars, bcvals[idir][ibound];
    shapes: x-planes (nz, ny), y-planes (nz, nx), z-planes (ny, nx).
    Returns dict {('x'|'y'|'z', 0|1): plane ndarray}.
    """
    nx, ny, nz = cfg.ng
    dl = cfg.dl
    dzc, dzf = grid.dzc, grid.dzf
    if c_or_f[2] == 'c':
        dzc01 = (dzc[0], dzc[nz])
        dzf01 = (dzf[1], dzf[nz])
    else:
        dzc01 = (dzc[1], dzc[nz - 1])
        dzf01 = (dzf[1], dzf[nz])
    metr = {
        0: ((dl[0], dl[0]), (dl[0], dl[0])),
        1: ((dl[1], dl[1]), (dl[1], dl[1])),
        2: (dzc01, dzf01),
    }
    out = {}
    for idir, key in ((0, 'x'), (1, 'y'), (2, 'z')):
        dlc, dlf = metr[idir]
        for ib in range(2):
            # scalar BC values stay scalar (broadcast at use-site; avoids
            # inlining full-plane literals into the jitted program)
            bcv = np.asarray(bcvals[idir][ib], dtype=np.float64)
            letter = cbc[idir][ib]
            cf = c_or_f[idir]
            if letter == 'P':
                plane = bcv * 0.0
            elif letter == 'D':
                fac = 2.0 if cf == 'c' else 1.0
                plane = -fac * bcv / (dlc[ib] * dlf[ib])
            else:  # 'N'
                sgn = 1.0 if ib == 0 else -1.0
                div = dlf[ib] if cf == 'c' else dlc[ib]
                plane = sgn * bcv / div
            out[(key, ib)] = plane
    return out


def rhs_bound_planes_dyn(cfg: Config, grid: Grid, cbc, c_or_f, bc_planes):
    """Traced variant of rhs_bound_planes for dynamic (wall-model-updated) BC
    planes (cmpt_rhs_b called per substep, main.f90:425-469).

    bc_planes[idir][ibound]: padded-transverse jnp planes; cropped to interior
    here.  cbc: per-direction (lo, hi) letter pairs.
    """
    nx, ny, nz = cfg.ng
    dl = cfg.dl
    dzc, dzf = grid.dzc, grid.dzf
    if c_or_f[2] == 'c':
        dzc01 = (dzc[0], dzc[nz])
        dzf01 = (dzf[1], dzf[nz])
    else:
        dzc01 = (dzc[1], dzc[nz - 1])
        dzf01 = (dzf[1], dzf[nz])
    metr = {0: ((dl[0], dl[0]), (dl[0], dl[0])),
            1: ((dl[1], dl[1]), (dl[1], dl[1])),
            2: (dzc01, dzf01)}
    ishape = {0: (nz, ny), 1: (nz, nx), 2: (ny, nx)}
    out = {}
    for idir, key in ((0, 'x'), (1, 'y'), (2, 'z')):
        dlc, dlf = metr[idir]
        for ib in range(2):
            val = bc_planes[idir][ib]
            if hasattr(val, 'ndim') and getattr(val, 'ndim', 0) == 2:
                bcv = val[1:-1, 1:-1]
            else:
                bcv = jnp.full(ishape[idir], val)
            letter = cbc[idir][ib]
            cf = c_or_f[idir]
            if letter == 'P':
                plane = jnp.zeros_like(bcv)
            elif letter == 'D':
                fac = 2.0 if cf == 'c' else 1.0
                plane = -fac * bcv / (dlc[ib] * dlf[ib])
            else:
                sgn = 1.0 if ib == 0 else -1.0
                div = dlf[ib] if cf == 'c' else dlc[ib]
                plane = sgn * bcv / div
            out[(key, ib)] = plane
    return out


def add_rhs_bound(cfg: Config, c_or_f, cbc, rhs, planes):
    """Add boundary planes onto the solver RHS (updt_rhs_b, bound.f90:562-617).
    rhs: (nz, ny, nx).  Statically-zero planes (all-periodic / homogeneous
    BCs, the common production case) skip the six dynamic-update-slice
    passes entirely."""
    if all(isinstance(p, (int, float, np.floating, np.ndarray))
           and np.all(np.asarray(p) == 0.0) for p in planes.values()):
        return rhs
    nx, ny, nz = cfg.ng
    q = [0, 0, 0]
    for idir in range(3):
        if c_or_f[idir] == 'f' and cbc[idir][1] == 'D':
            q[idir] = 1
    dt = rhs.dtype
    px0 = jnp.asarray(planes[('x', 0)], dtype=dt)
    px1 = jnp.asarray(planes[('x', 1)], dtype=dt)
    py0 = jnp.asarray(planes[('y', 0)], dtype=dt)
    py1 = jnp.asarray(planes[('y', 1)], dtype=dt)
    pz0 = jnp.asarray(planes[('z', 0)], dtype=dt)
    pz1 = jnp.asarray(planes[('z', 1)], dtype=dt)
    rhs = rhs.at[:, :, 0].add(px0)
    rhs = rhs.at[:, :, nx - 1 - q[0]].add(px1)
    rhs = rhs.at[:, 0, :].add(py0)
    rhs = rhs.at[:, ny - 1 - q[1], :].add(py1)
    rhs = rhs.at[0, :, :].add(pz0)
    rhs = rhs.at[nz - 1 - q[2], :, :].add(pz1)
    return rhs
