"""B-spline stack vs scipy oracles (mirrors reference tests/interpolation_test.py)."""

import numpy as np
from scipy.interpolate import BSpline as scipy_BSpline
from scipy.interpolate import CubicSpline

from gwinferno_tpu.interpolation import BasisSpline
from gwinferno_tpu.interpolation import BSpline
from gwinferno_tpu.interpolation import LogXBSpline
from gwinferno_tpu.interpolation import LogXLogYBSpline
from gwinferno_tpu.interpolation import LogYBSpline
from gwinferno_tpu.interpolation import NaturalCubicUnivariateSpline
from gwinferno_tpu.interpolation import RectBivariateBasisSpline

RNG = np.random.default_rng(42)


def test_natural_cubic_matches_scipy():
    gr = np.linspace(0, 1, 1000)
    for N in (20, 25, 30):
        for _ in range(5):
            xs = np.linspace(0, 1, N)
            ys = RNG.normal(size=N)
            want = CubicSpline(xs, ys, bc_type="natural")(gr)
            got = np.asarray(NaturalCubicUnivariateSpline(xs, ys)(gr))
            assert np.all(np.abs((want - got)[gr < 0.7]) < 5e-4)


def test_bspline_design_matrix_matches_scipy():
    gr = np.linspace(0, 1, 1000)
    N = 10
    bspl = BSpline(N)
    dmat = np.asarray(bspl.bases(gr)).T
    dmat2 = scipy_BSpline(np.asarray(bspl.knots), np.eye(N), 3)(gr)
    for i in range(N):
        assert np.allclose(dmat[:, i], dmat2[:, i]), f"basis {i} mismatch"


def test_bspline_partition_of_unity():
    gr = np.linspace(0, 1, 500)
    dmat = np.asarray(BSpline(12).bases(gr))
    assert np.allclose(dmat.sum(axis=0), 1.0, atol=1e-10)


def test_mspline_each_basis_integrates_to_one():
    gr = np.linspace(-1, 2, 20001)  # cover full (extended-knot) support
    spl = BasisSpline(10, normalize=False)
    dmat = np.asarray(spl._design(gr))
    vols = np.trapezoid(dmat, gr, axis=-1)
    assert np.allclose(vols, 1.0, atol=1e-3)


def test_basis_spline_norm():
    gr = np.linspace(0, 1, 1000)
    cs = RNG.uniform(size=10)
    spl = BasisSpline(10, normalize=True)
    norm = np.trapezoid(np.asarray(spl.project(spl.bases(gr), cs)), gr)
    assert abs(norm - 1.0) < 1e-3


def test_b_spline_norm():
    gr = np.linspace(0, 1, 1000)
    cs = RNG.uniform(size=10)
    spl = BSpline(10, normalize=True)
    norm = np.trapezoid(np.asarray(spl.project(spl.bases(gr), cs)), gr)
    assert abs(norm - 1.0) < 1e-3


def test_logy_spline_norm():
    gr = np.linspace(0, 1, 1000)
    cs = RNG.normal(size=10)
    spl = LogYBSpline(10, normalize=True)
    norm = np.trapezoid(np.asarray(spl.project(spl.bases(gr), cs)), gr)
    assert abs(norm - 1.0) < 1e-3


def test_logx_spline_norm():
    grid = np.linspace(0.001, 1, 1000)
    cs = RNG.uniform(size=10)
    spl = LogXBSpline(10, xrange=(0.001, 1), normalize=True)
    norm = np.trapezoid(np.asarray(spl.project(spl.bases(grid), cs)), grid)
    assert abs(norm - 1.0) < 1e-3


def test_logxlogy_spline_norm():
    grid = np.linspace(0.001, 1, 1000)
    cs = RNG.normal(size=10)
    spl = LogXLogYBSpline(10, xrange=(0.001, 1), normalize=True)
    norm = np.trapezoid(np.asarray(spl.project(spl.bases(grid), cs)), grid)
    assert abs(norm - 1.0) < 1e-3


def test_out_of_bounds_zero():
    spl = BSpline(8)
    vals = np.asarray(spl.bases(np.array([-0.5, 1.5])))
    assert np.all(vals == 0.0)


def test_logy_out_of_bounds_gives_zero_density():
    spl = LogYBSpline(8, normalize=True)
    cs = RNG.normal(size=8)
    p = np.asarray(spl.project(spl.bases(np.array([-0.5, 0.5, 1.5])), cs))
    assert p[0] == 0.0 and p[2] == 0.0 and p[1] > 0.0


def test_design_matrix_shape_follows_input():
    spl = BSpline(7)
    x2d = RNG.uniform(size=(5, 11))
    assert spl.bases(x2d).shape == (7, 5, 11)


def test_rect_bivariate_normalizes():
    spl = RectBivariateBasisSpline(6, 5, normalize=True)
    cs = RNG.normal(size=(6, 5)) * 0.3
    surface = np.asarray(spl.project(spl.grid_bases, cs))
    gx, gy = np.asarray(spl.gridx), np.asarray(spl.gridy)
    total = np.trapezoid(np.trapezoid(surface, gy, axis=0), gx)
    assert abs(total - 1.0) < 1e-3


def test_jit_and_grad_through_project():
    import jax
    import jax.numpy as jnp

    spl = LogYBSpline(10, normalize=True)
    dm = spl.bases(np.linspace(0, 1, 64))

    @jax.jit
    def f(cs):
        return jnp.sum(spl.project(dm, cs))

    g = jax.grad(f)(jnp.ones(10) * 0.1)
    assert np.all(np.isfinite(np.asarray(g)))
