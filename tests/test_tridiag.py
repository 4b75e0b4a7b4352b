"""Batched Thomas solver tests vs dense linear algebra (oracle per SURVEY §7.2
stage 3; reference solver.f90:82-179)."""
import numpy as np
import jax.numpy as jnp

from cales_tpu.ops.tridiag import thomas, thomas_periodic


def dense_trid(a, b, c, lam=0.0, periodic=False):
    n = len(b)
    L = np.zeros((n, n))
    for k in range(n):
        L[k, k] = b[k] + lam
        if k > 0:
            L[k, k - 1] = a[k]
        if k < n - 1:
            L[k, k + 1] = c[k]
    if periodic:
        L[0, n - 1] = a[0]
        L[n - 1, 0] = c[n - 1]
    return L


def test_thomas_matches_dense():
    rng = np.random.default_rng(0)
    n, ny, nx = 17, 3, 4
    a = rng.uniform(0.5, 1.5, n)
    c = rng.uniform(0.5, 1.5, n)
    b = -(a + c) - rng.uniform(0.5, 1.0, n)  # diagonally dominant
    rhs = rng.standard_normal((n, ny, nx))
    lam = rng.uniform(-0.5, 0.0, (ny, nx))
    out = np.asarray(thomas(a, b, c, jnp.asarray(rhs), lam=jnp.asarray(lam)))
    for j in range(ny):
        for i in range(nx):
            L = dense_trid(a, b, c, lam[j, i])
            np.testing.assert_allclose(out[:, j, i], np.linalg.solve(L, rhs[:, j, i]),
                                       rtol=1e-9, atol=1e-10)


def test_thomas_complex_rhs():
    rng = np.random.default_rng(1)
    n = 12
    a = rng.uniform(0.5, 1.5, n)
    c = rng.uniform(0.5, 1.5, n)
    b = -(a + c) - 0.7
    rhs = rng.standard_normal((n, 2, 2)) + 1j * rng.standard_normal((n, 2, 2))
    out = np.asarray(thomas(a, b, c, jnp.asarray(rhs)))
    L = dense_trid(a, b, c)
    for j in range(2):
        for i in range(2):
            np.testing.assert_allclose(out[:, j, i], np.linalg.solve(L, rhs[:, j, i]),
                                       rtol=1e-9, atol=1e-10)


def test_thomas_periodic_matches_dense():
    rng = np.random.default_rng(2)
    n, ny, nx = 15, 2, 3
    a = rng.uniform(0.5, 1.5, n)
    c = rng.uniform(0.5, 1.5, n)
    b = -(a + c) - rng.uniform(0.3, 0.8, n)
    rhs = rng.standard_normal((n, ny, nx))
    lam = rng.uniform(-0.5, -0.1, (ny, nx))
    out = np.asarray(thomas_periodic(a, b, c, jnp.asarray(rhs), lam=jnp.asarray(lam)))
    for j in range(ny):
        for i in range(nx):
            L = dense_trid(a, b, c, lam[j, i], periodic=True)
            np.testing.assert_allclose(out[:, j, i], np.linalg.solve(L, rhs[:, j, i]),
                                       rtol=1e-8, atol=1e-9)


def test_thomas_periodic_singular_zero_mean():
    """Fully periodic Laplacian is singular; a zero-mean RHS must be solved
    with zero-mean solution and the eps-regularized pivot (solver.f90:165-169)
    must not blow up."""
    n = 16
    a = np.ones(n)
    c = np.ones(n)
    b = -2.0 * np.ones(n)
    rng = np.random.default_rng(3)
    rhs = rng.standard_normal((n, 1, 1))
    rhs -= rhs.mean()
    out = np.asarray(thomas_periodic(a, b, c, jnp.asarray(rhs)))
    L = dense_trid(a, b, c, periodic=True)
    res = np.einsum('ij,j->i', L, out[:, 0, 0]) - rhs[:, 0, 0]
    np.testing.assert_allclose(res - res.mean(), 0.0, atol=1e-8)
