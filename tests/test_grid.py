"""Grid generation tests vs the stretching formulas (initgrid.f90)."""
import numpy as np
import pytest

from cales_tpu.grid import make_grid


@pytest.mark.parametrize("gtype", [1, 2, 3, 4, 5, 6])
def test_grid_consistency(gtype):
    n, lz, gr = 64, 2.0, 0.0 if gtype in (5, 6) else 1.5
    g = make_grid(gtype, n, gr, lz)
    # faces span [0, lz]
    assert g.zf[0] == 0.0
    np.testing.assert_allclose(g.zf[n], lz, rtol=1e-12)
    # spacings positive and consistent with faces/centers
    assert (g.dzf[1:n + 1] > 0).all()
    np.testing.assert_allclose(g.dzf[1:n + 1], g.zf[1:n + 1] - g.zf[:n], rtol=1e-10)
    np.testing.assert_allclose(g.zc[1:n + 1], 0.5 * (g.zf[1:n + 1] + g.zf[:n]),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(g.dzc[0:n + 1], g.zc[1:n + 2] - g.zc[0:n + 1],
                               rtol=1e-10, atol=1e-14)
    # ghost conventions (initgrid.f90:63-71)
    np.testing.assert_allclose(g.dzf[0], g.dzf[1])
    np.testing.assert_allclose(g.dzf[n + 1], g.dzf[n])
    np.testing.assert_allclose(g.zc[0], -g.dzc[0] / 2)


def test_uniform_grid():
    n, lz = 32, 1.0
    g = make_grid(1, n, 0.0, lz)
    np.testing.assert_allclose(g.dzf[1:n + 1], lz / n, rtol=1e-12)
    np.testing.assert_allclose(g.zc[1:n + 1],
                               (np.arange(1, n + 1) - 0.5) * lz / n, rtol=1e-12)


def test_two_end_clusters_at_walls():
    n, lz = 64, 2.0
    g = make_grid(1, n, 3.0, lz)
    assert g.dzf[1] < g.dzf[n // 2]
    assert g.dzf[n] < g.dzf[n // 2]
    np.testing.assert_allclose(g.dzf[1], g.dzf[n], rtol=1e-10)
